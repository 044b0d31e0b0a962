"""JSON schema -> regex (compiled by regex_dfa into a byte DFA).

The outlines approach (ref: vllm/v1/structured_output/backend_outlines
.py delegates to outlines-core's build_regex_from_schema): render the
schema as a regular grammar for its canonical serialized form. Strict
whitespace (none outside strings) keeps the automaton small and matches
the reference's default whitespace pattern for guided JSON.

Supported: type string/integer/number/boolean/null, enum/const,
object properties (+required, optional trailing subsets), arrays
(items, minItems/maxItems), anyOf/oneOf, string pattern/min/maxLength,
integer/number bounds are NOT enforced (regular languages can't).
"""

from __future__ import annotations

import json
import re as _re
from typing import Any

_STRING_INNER = r'([^"\\\x00-\x1f]|\\["\\/bfnrt]|\\u[0-9a-fA-F]{4})'
_STRING = f'"{_STRING_INNER}*"'
_INTEGER = r"(-)?(0|[1-9]\d*)"
_NUMBER = r"(-)?(0|[1-9]\d*)(\.\d+)?([eE][+-]?\d+)?"
_BOOLEAN = r"(true|false)"
_NULL = r"null"


def _escape_literal(text: str) -> str:
    """Regex-escape a JSON-serialized literal."""
    specials = set("\\^$.|?*+()[]{}")
    return "".join("\\" + ch if ch in specials else ch for ch in text)


def build_regex_from_schema(schema: dict[str, Any] | str) -> str:
    if isinstance(schema, str):
        schema = json.loads(schema)
    return _to_regex(schema)


def _to_regex(s: dict[str, Any]) -> str:
    if not isinstance(s, dict):
        raise ValueError(f"unsupported schema node: {s!r}")
    if "enum" in s:
        opts = "|".join(
            _escape_literal(json.dumps(v, separators=(",", ":")))
            for v in s["enum"])
        return f"({opts})"
    if "const" in s:
        return _escape_literal(json.dumps(s["const"],
                                          separators=(",", ":")))
    if "anyOf" in s or "oneOf" in s:
        subs = s.get("anyOf") or s.get("oneOf")
        return "(" + "|".join(_to_regex(x) for x in subs) + ")"
    t = s.get("type")
    if isinstance(t, list):
        return "(" + "|".join(_to_regex({**s, "type": x})
                              for x in t) + ")"
    if t == "string":
        if "pattern" in s:
            # Inner pattern applies to the string body.
            body = s["pattern"]
            body = body.removeprefix("^").removesuffix("$")
            return f'"{body}"'
        if "minLength" in s or "maxLength" in s:
            lo = s.get("minLength", 0)
            hi = s.get("maxLength")
            rep = (f"{{{lo},{hi}}}" if hi is not None else f"{{{lo},}}")
            return f'"{_STRING_INNER}{rep}"'
        return _STRING
    if t == "integer":
        return _INTEGER
    if t == "number":
        return _NUMBER
    if t == "boolean":
        return _BOOLEAN
    if t == "null":
        return _NULL
    if t == "array":
        item = _to_regex(s.get("items", {"type": "string"}))
        lo = s.get("minItems", 0)
        hi = s.get("maxItems")
        if hi is not None and hi == 0:
            return r"\[\]"
        if lo == 0:
            more = (f"(,{item}){{0,{hi - 1}}}" if hi is not None else
                    f"(,{item})*")
            return rf"\[({item}{more})?\]"
        more = (f"(,{item}){{{lo - 1},{hi - 1}}}" if hi is not None else
                f"(,{item}){{{lo - 1},}}")
        return rf"\[{item}{more}\]"
    if t == "object" or "properties" in s:
        props = s.get("properties", {})
        required = set(s.get("required", list(props)))
        parts = []
        for name, sub in props.items():
            key = _escape_literal(json.dumps(name))
            entry = f"{key}:{_to_regex(sub)}"
            parts.append((entry, name in required))
        if not parts:
            return r"\{\}"
        # Optional properties: keep order, allow presence subsets that
        # include all required keys. Build as a chain where optional
        # entries are individually skippable.
        segs = []
        first_done = False
        for entry, req in parts:
            if not first_done:
                if req:
                    segs.append(entry)
                    first_done = True
                else:
                    # optional head: include-or-skip with following comma
                    # handled by making it optional together with comma
                    segs.append(f"({entry},?)?")
                continue
            if req:
                segs.append(f",{entry}")
            else:
                segs.append(f"(,{entry})?")
        body = "".join(segs)
        return r"\{" + body + r"\}"
    raise ValueError(f"unsupported schema: {s!r}")


def validate_json_matches_schema_regex(regex: str, value: Any) -> bool:
    """Test helper: canonical serialization matches the built regex."""
    text = json.dumps(value, separators=(",", ":"))
    return _re.fullmatch(regex, text) is not None
