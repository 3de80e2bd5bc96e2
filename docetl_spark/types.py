"""Type grammar: docetl declared-output types → Spark DataTypes.

Mirrors the reference's `convert_val` grammar
(/root/reference/docetl/operations/utils/validation.py:137-171):

    string  : str | text | string | varchar     -> StringType
    integer : int | integer                     -> LongType
    number  : float | decimal | number          -> DoubleType
    boolean : bool | boolean                    -> BooleanType
    list    : list[T]      (bare `list` is rejected, as in the reference)
    object  : {k: T, ...}  inline literal       -> StructType
    enum    : enum[a, b, c]                     -> StringType (+ value set)

All declared columns are nullable (SURVEY.md §1.2: open-schema rows map to
nullable columns).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

_SCALARS = {
    "str": T.StringType(),
    "text": T.StringType(),
    "string": T.StringType(),
    "varchar": T.StringType(),
    "int": T.LongType(),
    "integer": T.LongType(),
    "float": T.DoubleType(),
    "decimal": T.DoubleType(),
    "number": T.DoubleType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
}


@dataclass
class ParsedType:
    spark_type: T.DataType
    enum_values: list[str] | None = None
    children: dict = field(default_factory=dict)


def parse_type(spec) -> ParsedType:
    """Parse one declared type spec (str or inline dict) to a Spark type."""
    if isinstance(spec, dict):
        fields, children = [], {}
        for k, v in spec.items():
            child = parse_type(v)
            children[k] = child
            fields.append(T.StructField(k, child.spark_type, True))
        return ParsedType(T.StructType(fields), children=children)
    if not isinstance(spec, str):
        raise ValueError(f"unsupported type spec: {spec!r}")
    s = spec.strip()
    low = s.lower()
    if low in _SCALARS:
        return ParsedType(_SCALARS[low])
    if low == "list":
        raise ValueError("bare `list` is not allowed; use list[T]")
    if low.startswith("list[") and s.endswith("]"):
        inner = parse_type(s[5:-1])
        return ParsedType(T.ArrayType(inner.spark_type, True))
    if low.startswith("enum[") and s.endswith("]"):
        values = [v.strip() for v in s[5:-1].split(",") if v.strip()]
        if not values:
            raise ValueError(f"empty enum: {spec!r}")
        return ParsedType(T.StringType(), enum_values=values)
    if s.startswith("{") and s.endswith("}"):
        # inline object literal: {a: str, b: int}
        body = s[1:-1].strip()
        fields, children = [], {}
        if body:
            for part in _split_top_level(body):
                k, _, v = part.partition(":")
                child = parse_type(v.strip())
                children[k.strip()] = child
                fields.append(T.StructField(k.strip(), child.spark_type, True))
        return ParsedType(T.StructType(fields), children=children)
    raise ValueError(f"unknown type spec: {spec!r}")


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside []/{}."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "[{":
            depth += 1
        elif ch in "]}":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def json_schema_of(spec, *, model: str = "") -> dict:
    """Declared type spec → JSON-schema fragment for LLM structured
    output (the reference's convert_val, validation.py:137-171): str→
    string, int→integer, float→number, bool→boolean, list[T]→array,
    {k: T}→object (required = all keys; additionalProperties false
    except gemini, which rejects it), enum[a,b]→string+enum."""
    if isinstance(spec, dict):
        props = {k: json_schema_of(v, model=model) for k, v in spec.items()}
        out = {"type": "object", "properties": props, "required": list(props)}
        if "gemini" not in model:
            out["additionalProperties"] = False
        return out
    if not isinstance(spec, str):
        raise ValueError(f"unsupported type spec: {spec!r}")
    s = spec.strip()
    low = s.lower()
    if low in ("str", "text", "string", "varchar"):
        return {"type": "string"}
    if low in ("int", "integer"):
        return {"type": "integer"}
    if low in ("float", "decimal", "number"):
        return {"type": "number"}
    if low in ("bool", "boolean"):
        return {"type": "boolean"}
    if low == "list":
        raise ValueError("bare `list` is not allowed; use list[T]")
    if low.startswith("list[") and s.endswith("]"):
        return {"type": "array", "items": json_schema_of(s[5:-1], model=model)}
    if low.startswith("enum[") and s.endswith("]"):
        values = [v.strip() for v in s[5:-1].split(",") if v.strip()]
        if not values:
            raise ValueError(f"empty enum: {spec!r}")
        return {"type": "string", "enum": values}
    if s.startswith("{") and s.endswith("}"):
        body = s[1:-1].strip()
        props = {}
        if body:
            for part in _split_top_level(body):
                k, _, v = part.partition(":")
                props[k.strip()] = json_schema_of(v.strip(), model=model)
        out = {"type": "object", "properties": props, "required": list(props)}
        if "gemini" not in model:
            out["additionalProperties"] = False
        return out
    raise ValueError(f"unknown type spec: {spec!r}")


def schema_of(output_schema: dict) -> T.StructType:
    """Declared output schema dict → StructType (all nullable)."""
    return T.StructType(
        [T.StructField(k, parse_type(v).spark_type, True) for k, v in output_schema.items()]
    )


# ------------------------------------------------ runtime output validation

def _value_conforms(value, pt: ParsedType) -> bool:
    """Recursive runtime check of a backend output value against a parsed
    type (validate_output_types, validation.py:203-276). None is allowed
    everywhere (declared columns are nullable). Bools are explicitly NOT
    integers (validation.py:174-181)."""
    if value is None:
        return True
    st = pt.spark_type
    if pt.enum_values is not None:
        return isinstance(value, str) and value in pt.enum_values
    if isinstance(st, T.StringType):
        return isinstance(value, str)
    if isinstance(st, T.LongType):
        return isinstance(value, int) and not isinstance(value, bool)
    if isinstance(st, T.DoubleType):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if isinstance(st, T.BooleanType):
        return isinstance(value, bool)
    if isinstance(st, T.ArrayType):
        inner = ParsedType(st.elementType)
        return isinstance(value, list) and all(_value_conforms(v, inner) for v in value)
    if isinstance(st, T.StructType):
        if not isinstance(value, dict):
            return False
        for f in st.fields:
            child = pt.children.get(f.name, ParsedType(f.dataType))
            if not _value_conforms(value.get(f.name), child):
                return False
        return True
    return True  # unknown types pass (fail open like the reference)


def validate_output_types(output: dict, output_schema: dict) -> list[str]:
    """Check a backend output dict against the declared schema; returns a
    list of violation messages (empty = conforms). Missing keys are
    violations; extra keys are ignored (the merge only takes declared
    keys anyway)."""
    problems = []
    for key, spec in output_schema.items():
        pt = parse_type(spec)
        if key not in output:
            problems.append(f"missing output key {key!r}")
        elif not _value_conforms(output[key], pt):
            problems.append(
                f"output key {key!r}: value {output[key]!r} does not conform to {spec!r}"
            )
    return problems
