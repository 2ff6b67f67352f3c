"""Browse-imagery mosaic tiles: the image x geospatial composition.

Every real tile service over an imagery corpus serves "browse"
mosaics: a zoom-z tile showing one small thumbnail per grid cell,
chosen deterministically from the images whose footprint lands in
that cell. The reference stops at the vector codec (vtzero is
geometry+properties only); this operator is the imagery twin of
engine/raster.py's vector->PNG renderer, composing five existing
engine pieces — tiling.assign_tiles, the in-repo JPEG/PNG decoders
(engine/jpeg.py, engine/png.py via payload.decode_payload), the
stacked thumbnail kernel (payload.thumbnail_batch), and the PNG
write path (png.encode) — into ONE declarative plan.

Built SELECT-THEN-DECODE for the 10^12-image shape:

- **Stage 1 (projection, zero shuffle)**: tile + cell assignment is
  pure integer arithmetic in whole-stage codegen (assign_tiles with
  buffer=0 never explodes).
- **Stage 2 (argmin, one narrow shuffle)**: per (tile, cell) the
  winner is ``min(iid)`` — the aggregate touches ONLY the 8-byte key,
  never the payload, so map-side combine caps every task's shuffle
  contribution at tiles x grid^2 16-byte rows and no image byte ever
  enters an aggregation buffer. (A ``min_by(struct(iid, bytes), iid)``
  one-shuffle formulation was measured 4x slower at sf0.1: it copies
  EVERY input payload into an unsafe aggregate row before the combine
  can discard it.)
- **Stage 3 (broadcast fetch, zero corpus shuffle)**: the winner set
  (<= tiles x grid^2 rows) broadcasts back onto the corpus as an
  inner hash join on iid — the corpus is never shuffled and its
  bytes column is scanned exactly once, already filtered.
- **Stage 4 (decode winners only)**: the expensive Python work
  (JPEG/PNG decode) runs on at most tiles x grid^2 rows — at z2 /
  grid 8 that is <= 1,024 decodes for ANY corpus size, vs 10^12 if
  decode preceded selection. Decodes batch through the stacked
  thumbnail kernel; corrupt payloads become ok=false rows (errors
  as data), never task failures.
- **Stage 5 (composite, one tiny shuffle)**: groupBy tile places each
  t x t thumbnail at its grid cell and encodes through png.encode's
  vectorized-decodable write path. Each group holds <= grid^2 rows
  by construction — no hot-tile pile is possible.

Total: two hash exchanges (both bounded by tiles x grid^2 rows) plus
one broadcast, decode cost O(tiles x grid^2), the corpus itself never
shuffled. The operator's output is image bytes, so correctness is
pinned by a serial numpy/pandas reference plus PNG lossless
round-trip in tests/test_mosaic.py (no SQL oracle — same class as
mvt_tiles/render_png).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import png
from .payload import _decode_and_group, thumbnail_batch, _STACK_CHUNK
from .tiling import EXTENT, ZOOM, assign_tiles


def mosaic_tiles(images: DataFrame, zoom: int = ZOOM, extent: int = EXTENT,
                 thumb: int = 16, grid: int = 8,
                 broadcast_winners: bool = True,
                 attach=None) -> DataFrame:
    """Render one ``grid*thumb``-px square PNG mosaic per zoom-``zoom``
    tile: the tile splits into ``grid x grid`` cells, each cell shows
    the ``thumb x thumb`` thumbnail of its deterministic winner (the
    smallest ``iid`` landing in the cell; empty cells stay black).

    ``images`` needs (iid, wx, wy, bytes, fmt) with UNIQUE iid (the
    corpus key — a duplicate iid would fetch twice and race for its
    cell). Returns one row per non-empty tile: (z, x, y, n_images,
    n_failed, w, h, png) where n_images counts placed thumbnails and
    n_failed counts winners whose payload did not decode (their cells
    stay black).

    ``broadcast_winners=False`` switches the fetch to a shuffle join
    for extreme zoom x occupancy where tiles x grid^2 winner rows
    outgrow a broadcast (e.g. a full zoom-12 pyramid).

    ``attach``: optional callable attaching the ``bytes``/``fmt``
    payload columns to a winner-filtered frame (e.g.
    payload.with_image_bytes).  When given, ``images`` carries only
    (iid, wx, wy[, attach inputs]) and the payload materializes for
    the <= tiles x grid^2 WINNERS alone — the select-then-decode
    contract extended through an opaque payload source: a Python
    synthesis/fetch stage is a black box to Catalyst, so a
    bytes-carrying input would pay the payload for every corpus row
    on both the selection scan and the fetch join (measured 3x the
    query at sf0.1).  Output is bit-identical (same winners, same
    per-iid payload function; pinned in tests/test_mosaic.py).
    """
    if grid < 1 or thumb < 1:
        raise ValueError(f"grid={grid} and thumb={thumb} must be >= 1")
    t, g = int(thumb), int(grid)

    sel = images.select("iid", "wx", "wy") if attach is None else images
    cells = (
        assign_tiles(sel.select("iid", "wx", "wy"),
                     zoom=zoom, extent=extent)
        .withColumn("cx", F.expr(f"cast((loc_x * {g}) div {extent} as int)"))
        .withColumn("cy", F.expr(f"cast((loc_y * {g}) div {extent} as int)"))
    )
    win_ids = (
        cells.groupBy("z", "x", "y", "cx", "cy")
        .agg(F.min("iid").alias("iid"))
    )
    if broadcast_winners:
        win_ids = F.broadcast(win_ids)
    if attach is None:
        winners = images.select("iid", "bytes", "fmt").join(win_ids, "iid")
    else:
        winners = attach(images.join(win_ids, "iid")) \
            .select("iid", "bytes", "fmt", "z", "x", "y", "cx", "cy")
    # the fetch output is tiny (<= tiles x grid^2 rows) but inherits
    # the corpus' partitioning; spread so the Python decode stage
    # uses the whole cluster
    from .textops import _spread

    winners = _spread(winners)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            pxs, statuses, groups = _decode_and_group(pdf)
            thumbs: list = [b""] * n
            for shape, idxs in groups.items():
                for c0 in range(0, len(idxs), _STACK_CHUNK):
                    part = idxs[c0:c0 + _STACK_CHUNK]
                    stack = np.stack([pxs[i] for i in part])
                    tb = thumbnail_batch(stack, t)
                    for j, i in enumerate(part):
                        thumbs[i] = tb[j].tobytes()
            yield pd.DataFrame({
                "z": pdf["z"].to_numpy(),
                "x": pdf["x"].to_numpy(),
                "y": pdf["y"].to_numpy(),
                "cx": pdf["cx"].to_numpy(),
                "cy": pdf["cy"].to_numpy(),
                "thumb": thumbs,
                "ok": [s == "ok" for s in statuses],
            })

    decoded = winners.mapInPandas(
        decode,
        schema="z int, x long, y long, cx int, cy int, "
               "thumb binary, ok boolean",
    )

    size = g * t

    def composite(key, pdf: pd.DataFrame) -> pd.DataFrame:
        canvas = np.zeros((size, size, 3), dtype=np.uint8)
        ok = pdf[pdf["ok"].to_numpy()]
        a_cx = ok["cx"].to_numpy()
        a_cy = ok["cy"].to_numpy()
        a_tb = ok["thumb"].to_numpy(object)
        for i in range(len(ok)):          # <= grid^2 rows by construction
            cy, cx = int(a_cy[i]), int(a_cx[i])
            tile = np.frombuffer(a_tb[i], dtype=np.uint8).reshape(t, t, 3)
            canvas[cy * t:(cy + 1) * t, cx * t:(cx + 1) * t] = tile
        return pd.DataFrame([{
            "z": int(key[0]), "x": int(key[1]), "y": int(key[2]),
            "n_images": int(len(ok)),
            "n_failed": int((~pdf["ok"]).sum()),
            "w": size, "h": size,
            "png": png.encode(canvas),
        }])

    return decoded.groupBy("z", "x", "y").applyInPandas(
        composite,
        schema="z int, x long, y long, n_images int, n_failed int, "
               "w int, h int, png binary",
    )
