"""Debug formatting parity with the reference's operator<< overloads
(output.hpp:26-60, name tables types.hpp:62-88)."""

from __future__ import annotations

from vtzero_spark.mvt import output as O


def test_geom_type_names():
    assert [O.geom_type_name(i) for i in range(4)] == [
        "unknown", "point", "linestring", "polygon"]
    assert O.geom_type_name(9) == "unknown"


def test_property_value_type_names():
    assert [O.property_value_type_name(i) for i in range(1, 8)] == [
        "string", "float", "double", "int", "uint", "sint", "bool"]
    assert O.property_value_type_name(0) == ""
    assert O.property_value_type_name(8) == ""


def test_index_and_point_rendering():
    assert O.format_index(7) == "7"
    assert O.format_index(None) == "invalid"
    assert O.format_index(-1) == "invalid"
    assert O.format_index_pair(1, 2) == "[1,2]"
    assert O.format_index_pair(None, 2) == "invalid"
    assert O.format_point(25, 17) == "(25,17)"


def test_plan_side_labels(spark):
    df = spark.createDataFrame(
        [(0,), (1,), (2,), (3,), (7,)], "t int")
    got = df.select(O.geom_type_label("t").alias("g")).toPandas()["g"].tolist()
    assert got == ["unknown", "point", "linestring", "polygon", "unknown"]
    vt = spark.createDataFrame([(i,) for i in range(9)], "v int")
    lv = vt.select(O.value_type_label("v").alias("l")).toPandas()["l"].tolist()
    assert lv == ["", "string", "float", "double", "int", "uint",
                  "sint", "bool", ""]
