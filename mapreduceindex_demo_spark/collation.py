"""Order-preserving cross-type key collation.

Replicates the *semantics* of the reference's collatejson encoding
(`/root/reference/Projector/JSEvaluate.go:56-130` ``CollateIt``): emitted
composite keys of arbitrary JSON values serialize to bytes whose
lexicographic order equals the cross-type collation order

    MISSING < null < false < true < number < string < array < object

(type-tag bytes at JSEvaluate.go:66-110; numbers normalized so ints and
floats interleave, JSEvaluate.go:82-95; zero-byte-escaped strings,
JSEvaluate.go:132-142; each emit wrapped as one array so composite keys
compare field-by-field, JSEvaluate.go:65-68).

This is a fresh Spark-side design, not a byte-level port: numbers use the
IEEE-754 sign-flip trick (order-preserving over all finite doubles) instead
of scientific-notation strings, and objects collate by canonical (sorted-key)
JSON, matching the reference's JSONSTRING behavior (v8Instance.cpp:59-68).

Usage note (scale): homogeneous typed keys — the common case — never touch
this module; native column ordering already matches. ``collate_key`` is only
attached when an index declares mixed-type keys, and then as a vectorized
pandas UDF so the Python cost is Arrow-batched.
"""

from __future__ import annotations

import json
import math
import struct
from functools import cmp_to_key
from typing import Any

# type tags — one byte, ordering IS the collation order
_TAG_MISSING = b"\x02"
_TAG_NULL = b"\x03"
_TAG_FALSE = b"\x04"
_TAG_TRUE = b"\x05"
_TAG_NUMBER = b"\x06"
_TAG_STRING = b"\x07"
_TAG_ARRAY = b"\x08"
_TAG_OBJECT = b"\x09"
_TERM = b"\x00"

class _Missing:
    """Singleton sentinel that survives pickling (UDF closures ship to
    executors — a bare ``object()`` would unpickle as a new instance and
    break ``is`` checks there)."""

    _inst: "_Missing | None" = None

    def __new__(cls) -> "_Missing":
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __reduce__(self):
        return (_Missing, ())

    def __repr__(self) -> str:  # pragma: no cover - debugging nicety
        return "MISSING"


#: sentinel distinct from None (null): a key expression that evaluated to
#: "nothing" (the reference's MISSING, i.e. JS undefined / absent field)
MISSING = _Missing()


def _encode_number(v: float) -> bytes:
    """Finite double → 8 bytes whose lexicographic order equals numeric
    order: flip the sign bit for non-negatives, flip all bits for
    negatives."""
    if isinstance(v, bool):  # pragma: no cover - guarded by caller
        raise TypeError("bool is not a number here")
    f = float(v)
    if math.isnan(f) or math.isinf(f):
        raise ValueError(f"non-finite number not collatable: {v!r}")
    if f == 0.0:
        f = 0.0  # normalize -0.0 → +0.0 so equal values encode equally
    (bits,) = struct.unpack(">Q", struct.pack(">d", f))
    if bits & 0x8000_0000_0000_0000:
        bits ^= 0xFFFF_FFFF_FFFF_FFFF
    else:
        bits |= 0x8000_0000_0000_0000
    return struct.pack(">Q", bits)


def _encode_string(s: str) -> bytes:
    """UTF-8 with 0x00 escaped as 0x00 0x01, terminated by 0x00 0x00 — keeps
    prefix ordering correct for embedded NULs (reference encodeString,
    JSEvaluate.go:132-142)."""
    return s.encode("utf-8").replace(b"\x00", b"\x00\x01") + b"\x00\x00"


def encode_value(v: Any) -> bytes:
    """Encode one JSON value (self-terminating)."""
    if v is MISSING:
        return _TAG_MISSING
    if v is None:
        return _TAG_NULL
    if isinstance(v, bool):
        return _TAG_TRUE if v else _TAG_FALSE
    if isinstance(v, (int, float)):
        # ints collate as doubles (ints beyond 2^53 collapse to their
        # nearest double — same loss the reference's JS layer has, since
        # every JS number is a double)
        return _TAG_NUMBER + _encode_number(v)
    if isinstance(v, str):
        return _TAG_STRING + _encode_string(v)
    if isinstance(v, (list, tuple)):
        return _TAG_ARRAY + b"".join(encode_value(x) for x in v) + _TERM
    if isinstance(v, dict):
        # reference collates plain objects by their JSON string
        # (JSONSTRING emit type); canonicalize with sorted keys
        return _TAG_OBJECT + _encode_string(
            json.dumps(v, sort_keys=True, separators=(",", ":"))
        )
    raise TypeError(f"not a JSON value: {type(v).__name__}")


def collate_key(values: list[Any] | tuple[Any, ...]) -> bytes:
    """Encode one composite index key (one emit) as an array, so multi-part
    keys compare field-by-field then by length (EMITSTART→TypeArray,
    JSEvaluate.go:65-68)."""
    return encode_value(list(values))


# -- reference comparator (spec oracle for property tests) ------------------

_ORDER = {"missing": 0, "null": 1, "false": 2, "true": 3, "number": 4,
          "string": 5, "array": 6, "object": 7}


def _kind(v: Any) -> str:
    if v is MISSING:
        return "missing"
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, (list, tuple)):
        return "array"
    if isinstance(v, dict):
        return "object"
    raise TypeError(f"not a JSON value: {type(v).__name__}")


def json_compare(a: Any, b: Any) -> int:
    """Spec comparator implementing the collation order directly (used by
    property tests to check ``encode_value`` is order-preserving)."""
    ka, kb = _kind(a), _kind(b)
    if ka != kb:
        return -1 if _ORDER[ka] < _ORDER[kb] else 1
    if ka in ("missing", "null", "false", "true"):
        return 0
    if ka == "number":
        fa, fb = float(a), float(b)
        return -1 if fa < fb else (1 if fa > fb else 0)
    if ka == "string":
        ba, bb = a.encode("utf-8"), b.encode("utf-8")
        return -1 if ba < bb else (1 if ba > bb else 0)
    if ka == "array":
        for xa, xb in zip(a, b):
            c = json_compare(xa, xb)
            if c:
                return c
        return -1 if len(a) < len(b) else (1 if len(a) > len(b) else 0)
    # object: canonical JSON string comparison (matches encode_value)
    ja = json.dumps(a, sort_keys=True, separators=(",", ":")).encode()
    jb = json.dumps(b, sort_keys=True, separators=(",", ":")).encode()
    return -1 if ja < jb else (1 if ja > jb else 0)


json_sort_key = cmp_to_key(json_compare)
