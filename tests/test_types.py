"""Type grammar + runtime output validation (reference validation.py)."""

import pytest
from pyspark.sql import types as T

from docetl_spark import FakeBackend, SemanticFrame
from docetl_spark.types import parse_type, schema_of, validate_output_types


def test_scalar_spellings():
    assert isinstance(parse_type("varchar").spark_type, T.StringType)
    assert isinstance(parse_type("integer").spark_type, T.LongType)
    assert isinstance(parse_type("decimal").spark_type, T.DoubleType)
    assert isinstance(parse_type("boolean").spark_type, T.BooleanType)


def test_bare_list_rejected():
    with pytest.raises(ValueError, match="list\\[T\\]"):
        parse_type("list")


def test_nested_and_enum():
    pt = parse_type("list[{a: str, b: list[int]}]")
    assert isinstance(pt.spark_type, T.ArrayType)
    assert isinstance(pt.spark_type.elementType, T.StructType)
    en = parse_type("enum[x, y, z]")
    assert en.enum_values == ["x", "y", "z"]


def test_schema_of_nullable():
    st = schema_of({"a": "int", "b": "list[str]"})
    assert all(f.nullable for f in st.fields)


def test_validate_output_types_scalars():
    schema = {"n": "int", "f": "float", "b": "bool", "s": "str"}
    assert validate_output_types({"n": 1, "f": 1.5, "b": True, "s": "x"}, schema) == []
    # bools are not ints (validation.py:174-181)
    assert validate_output_types({"n": True, "f": 1.5, "b": True, "s": "x"}, schema)
    # ints are acceptable floats
    assert validate_output_types({"n": 1, "f": 2, "b": False, "s": "x"}, schema) == []
    assert validate_output_types({"n": 1, "f": 1.5, "b": 1, "s": "x"}, schema)
    assert validate_output_types({"f": 1.5, "b": True, "s": "x"}, schema) == ["missing output key 'n'"]


def test_validate_output_types_nested_and_enum():
    schema = {"tags": "list[str]", "meta": "{k: str, n: int}", "lvl": "enum[low, high]"}
    good = {"tags": ["a"], "meta": {"k": "x", "n": 1}, "lvl": "low"}
    assert validate_output_types(good, schema) == []
    assert validate_output_types({**good, "lvl": "mid"}, schema)
    assert validate_output_types({**good, "tags": ["a", 1]}, schema)
    assert validate_output_types({**good, "meta": {"k": "x", "n": "one"}}, schema)
    assert validate_output_types({**good, "meta": {"k": None, "n": None}}, schema) == []  # nullable


def test_map_strict_types_raises(docs):
    be = FakeBackend(rules={"n": lambda row: "not an int"})
    sf = SemanticFrame.from_df(docs.limit(1), backend=be).map(
        "x {{ input.text }}", {"n": "int"}, strict_types=True
    )
    with pytest.raises(Exception, match="type validation failed"):
        sf.collect()


def test_map_strict_types_passes(docs):
    be = FakeBackend(rules={"n": lambda row: 7})
    out = (
        SemanticFrame.from_df(docs.limit(2), backend=be)
        .map("x {{ input.text }}", {"n": "int"}, strict_types=True)
        .collect()
    )
    assert all(r["n"] == 7 for r in out)
