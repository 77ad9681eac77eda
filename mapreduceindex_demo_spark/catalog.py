"""Engine catalog: named map functions + index definitions.

Re-expresses the reference's control plane in-process:

- Function library CRUD (reference: metakv under ``/eventing/view/`` via
  ``http_handlers.go:2001-2057``, routes ``manager.go:130-135``) → a Python
  registry with compile-check-on-save (reference D7,
  ``http_handlers.go:1210-1223``) and a "reject delete of a function used by
  an index" guard (intent of ``eventing.js:301-306``).
- Index definition model (reference ``IndexDefn``, ``index.go:173-214``) →
  :class:`IndexDefn` dataclass, with equivalent-index detection
  (``index.go:529-572``).

On a real deployment this registry would be a small catalog table
(JSON-serialized defns); in-process dicts keep the engine self-contained.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field, asdict
from typing import Any


@dataclass(frozen=True)
class RegisteredFunction:
    """A named map function: ``fn(meta: dict, doc: dict) -> list[tuple]``.

    Each returned tuple is one emitted composite key (reference ``emit()``,
    ``v8Instance.cpp:71-79``); returning ``[]`` means the WHERE predicate is
    false for this document (reference ``indexjs.go:109-111``)."""

    name: str
    fn: Callable[[dict, dict], list]
    description: str = ""


@dataclass(frozen=True)
class IndexDefn:
    """Index definition — field-for-field capability match of the
    reference's ``IndexDefn`` (``index.go:173-214``), minus cluster-only
    concerns (replicas/proxy instances are storage-layer in Spark)."""

    name: str
    bucket: str  # source table name
    #: declarative branch (reference ExprType_N1QL, M4): one Spark SQL
    #: expression per key part — Catalyst evaluates these JVM-side
    sec_exprs: tuple[str, ...] | None = None
    #: programmable branch (reference ExprType_JAVASCRIPT, M1): name of a
    #: registered map function
    func_name: str | None = None
    #: Spark types of the emitted key parts (function indexes must declare;
    #: expression indexes infer)
    key_types: tuple[str, ...] | None = None
    where_expr: str | None = None  # M5
    desc: tuple[bool, ...] | None = None  # per-key-part DESC (index.go:189)
    is_primary: bool = False  # primary index = doc ids only
    is_array_index: bool = False  # first key part explodes per element
    partition_scheme: str = "SINGLE"  # SINGLE | KEY | HASH | RANGE (P1)
    partition_keys: tuple[str, ...] | None = None  # P2
    num_partitions: int = 32
    immutable: bool = False  # skip retraction branch (indexjs.go:158-160)
    retain_deleted_xattr: bool = False  # M8
    deferred: bool = False  # build later (index.go:190)
    #: attach an order-preserving binary sort key for mixed-type keys (§1.3)
    use_collation: bool = False

    def equivalence_key(self) -> tuple:
        """Structural identity for equivalent-index dedup (reference
        ``IsEquivalentIndex``, index.go:529-572): everything except the
        name and deployment-ish knobs."""
        d = asdict(self)
        for k in ("name", "deferred", "num_partitions"):
            d.pop(k)
        return tuple(sorted((k, repr(v)) for k, v in d.items()))


class Catalog:
    """In-process function + index catalog with the reference's guards."""

    def __init__(self) -> None:
        self._functions: dict[str, RegisteredFunction] = {}
        self._indexes: dict[str, IndexDefn] = {}

    # -- function library (D5-D7) ------------------------------------------

    def register_function(
        self, name: str, fn: Callable[[dict, dict], list] | str, description: str = ""
    ) -> RegisteredFunction:
        """Save a named map function. A source string is compile-checked and
        must define ``on_map(meta, doc)`` (reference compile-on-save, D7)."""
        if isinstance(fn, str):
            ns: dict[str, Any] = {}
            code = compile(fn, f"<function:{name}>", "exec")  # syntax check
            exec(code, ns)
            if "on_map" not in ns or not callable(ns["on_map"]):
                raise ValueError(
                    f"function source for {name!r} must define on_map(meta, doc)"
                )
            fn = ns["on_map"]
        if not callable(fn):
            raise TypeError("fn must be callable or source text")
        reg = RegisteredFunction(name=name, fn=fn, description=description)
        self._functions[name] = reg
        return reg

    def register_function_from_file(
        self, name: str, path: str, description: str = ""
    ) -> RegisteredFunction:
        """Load a map function from a source FILE — the reference's
        iteration-1 path-based registration (``JSPath``,
        ``Projector/kv_sender.go:1168-1176``: evaluators constructed from a
        filename; iteration 2 moved to by-name lookup, which
        :meth:`register_function` models). Same compile-check-on-save."""
        with open(path, encoding="utf-8") as f:
            src = f.read()
        return self.register_function(name, src, description=description)

    def get_function(self, name: str) -> RegisteredFunction:
        if name not in self._functions:
            raise KeyError(f"no registered function {name!r}")
        return self._functions[name]

    def list_functions(self) -> list[str]:
        return sorted(self._functions)

    def delete_function(self, name: str) -> None:
        used_by = [i.name for i in self._indexes.values() if i.func_name == name]
        if used_by:
            raise ValueError(
                f"function {name!r} is used by indexes {used_by}; drop them first"
            )
        self._functions.pop(name, None)

    # -- index definitions (D1, D4) ----------------------------------------

    def add_index(self, defn: IndexDefn) -> IndexDefn:
        if defn.name in self._indexes:
            raise ValueError(f"index {defn.name!r} already exists")
        if (defn.sec_exprs is None) == (defn.func_name is None) and not defn.is_primary:
            raise ValueError("exactly one of sec_exprs / func_name required")
        if defn.func_name is not None:
            self.get_function(defn.func_name)  # must exist
            if not defn.key_types:
                raise ValueError("function indexes must declare key_types")
        eq = defn.equivalence_key()
        for other in self._indexes.values():
            if other.equivalence_key() == eq:
                raise ValueError(
                    f"equivalent index already exists: {other.name!r} "
                    "(reference IsEquivalentIndex semantics)"
                )
        self._indexes[defn.name] = defn
        return defn

    def get_index(self, name: str) -> IndexDefn:
        if name not in self._indexes:
            raise KeyError(f"no index {name!r}")
        return self._indexes[name]

    def drop_index(self, name: str) -> None:
        self._indexes.pop(name, None)

    def list_indexes(self) -> list[str]:
        return sorted(self._indexes)

    def find_index(
        self, bucket: str, leading_expr: str | None = None
    ) -> IndexDefn:
        """Index SELECTION — the reference's query service picks an index
        for a scan rather than making callers name one (GSI planner over
        IndexDefn metadata). Matches on bucket + normalized leading key
        expression; a primary index matches ``leading_expr=None``.
        Deterministic tie-break: lexicographically first index name."""
        norm = (leading_expr or "").replace(" ", "").lower()
        matches = []
        for d in self._indexes.values():
            if d.bucket != bucket:
                continue
            if leading_expr is None:
                if d.is_primary:
                    matches.append(d)
            elif d.sec_exprs and d.sec_exprs[0].replace(" ", "").lower() == norm:
                matches.append(d)
        if not matches:
            raise KeyError(
                f"no index on bucket {bucket!r} with leading expr "
                f"{leading_expr!r}; have {self.list_indexes()}"
            )
        return sorted(matches, key=lambda d: d.name)[0]
