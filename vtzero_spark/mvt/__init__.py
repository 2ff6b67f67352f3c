"""Pure numpy MVT (Mapbox Vector Tile spec 2.x) codec — no Spark deps."""

from . import errors, geometry, pbf, tile, values  # noqa: F401
