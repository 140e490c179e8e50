"""Declarative map-spec model.

The reference engine (`/root/reference/src/DBT.php:44-47,58-59`) is driven by a
nested PHP array ``$maps`` — its only IR.  This module is the typed, validated
Python equivalent.  The planner (:mod:`database_transportor_spark.plans.planner`)
compiles a validated :class:`MapSpec` set into lazy DataFrame pipelines; nothing
here touches Spark.

Spec shape (mirrors the reference README examples, README.md:56-361)::

    maps = {
        "new_users": {                        # map key = logical table name
            "target_table": "new_users2",     # optional physical override (S4)
            "original_table": "old_users",    # source table (S1)
            "extra_conditions": [             # F1-F3: raw SQL or [col, op, val]
                ["name", "<>", "王五"],
                "id > 0",
            ],
            "order": {"order_by": "id", "direction": "asc"},   # O1
            "transport_after": "other_map",   # X2 explicit dependency
            "columns": {
                "id": "id",                               # P1 rename
                "flag": {"default": 1},                   # P2 constant
                "name": {"original": "name", "default": "?"},   # P3 coalesce
                "slug": {"original": "name",              # P4 transform
                         "function": "concat(name, '-', id)"},
                "role_id": {"refer": {...}, "default": 0},      # J1/J2
                "amount": {"refers": {...}, "default": 0},      # J3
                "tmp": {"original": "x",
                        "delete_after_transport": True},  # X5 staging col
                "skip_me": None,                          # P6 skip
            },
            "middle": {"one": {...}, "many": {...}},      # M1/M2
        },
    }

Scalar hooks (``function`` / ``pre_format`` / ``format_wanted`` /
``processor``) accept **Spark SQL expression strings** (the fast,
Catalyst-optimizable path — the reference's arbitrary PHP closures,
DBT.php:395-407, have no cheap distributed equivalent) or Python callables
(compiled to UDFs — the slow escape hatch).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Union

__all__ = [
    "SpecError",
    "Condition",
    "OrderSpec",
    "ReferSpec",
    "RefersSpec",
    "AsofReferSpec",
    "AffectionSpec",
    "ColumnSpec",
    "MiddleSide",
    "MiddleSpec",
    "MapSpec",
    "parse_maps",
]

# A scalar hook: a Spark SQL expression string or a Python callable.
Hook = Union[str, Callable[..., Any]]

SIDE_ORIGINAL = "original"
SIDE_TARGET = "target"

#: operators understood by the structured condition compiler
#: (queryComposer, DBT.php:357-388).
CONDITION_OPS = {
    "=", ">", "<", "<>", "!=",
    "like", "notlike", "in", "notin", "between", "notbetween",
}


class SpecError(ValueError):
    """Raised on invalid map specs — mirrors the exceptions the reference
    throws for misconfiguration (DBT.php:95,117,217,372,433,515)."""


@dataclass(frozen=True)
class Condition:
    """One filter condition: raw SQL (F2) or a ``[column, op, value]`` triple
    (F3, DBT.php:357-388)."""

    raw: Optional[str] = None
    column: Optional[str] = None
    op: Optional[str] = None
    value: Any = None

    @property
    def is_raw(self) -> bool:
        return self.raw is not None

    @staticmethod
    def parse(obj: Any) -> "Condition":
        if isinstance(obj, Condition):
            return obj
        if isinstance(obj, str):
            if not obj.strip():
                raise SpecError("empty raw-SQL condition")
            return Condition(raw=obj)
        if isinstance(obj, (list, tuple)):
            if len(obj) != 3:
                raise SpecError(
                    f"structured condition must be [column, op, value], got {obj!r}"
                )
            col, op, value = obj
            if not isinstance(col, str) or not col:
                raise SpecError(f"condition column must be a string, got {col!r}")
            if not isinstance(op, str):
                raise SpecError(f"condition op must be a string, got {op!r}")
            # Reference normalizes case and strips all spaces (DBT.php:358).
            norm = op.replace(" ", "").lower()
            if norm not in CONDITION_OPS:
                raise SpecError(f"unsupported condition op {op!r}")
            return Condition(column=col, op=norm, value=value)
        raise SpecError(f"condition must be a string or [col, op, value]: {obj!r}")


@dataclass(frozen=True)
class OrderSpec:
    """Scan ordering (O1, DBT.php:168)."""

    order_by: str
    direction: str = "asc"

    @staticmethod
    def parse(obj: Any) -> "OrderSpec":
        if isinstance(obj, OrderSpec):
            return obj
        if not isinstance(obj, dict) or "order_by" not in obj:
            raise SpecError(f"order must be {{'order_by': col, 'direction': asc|desc}}, got {obj!r}")
        direction = str(obj.get("direction", "asc")).lower()
        if direction not in ("asc", "desc"):
            raise SpecError(f"order direction must be asc|desc, got {direction!r}")
        return OrderSpec(order_by=obj["order_by"], direction=direction)


def _parse_conditions(obj: Any, where: str) -> tuple[Condition, ...]:
    if obj is None:
        return ()
    if not isinstance(obj, (list, tuple)):
        raise SpecError(f"{where}: conditions must be a list, got {obj!r}")
    return tuple(Condition.parse(c) for c in obj)


def _as_key_list(v: Any, where: str) -> tuple[str, ...]:
    if isinstance(v, str):
        return (v,)
    if isinstance(v, (list, tuple)) and v and all(isinstance(x, str) for x in v):
        return tuple(v)
    raise SpecError(f"{where} must be a column name or non-empty list of names, got {v!r}")


@dataclass(frozen=True)
class ReferSpec:
    """Single/multi-key lookup join (J1/J2, DBT.php:277-343).

    Single key (len(according)==1): both join sides are rtrim-normalized when
    string-typed (DBT.php:306-312), duplicate build keys collapse
    (dict-overwrite in the reference; we pin a deterministic reduction — see
    ``operators/refer.py``), and a miss fills the column ``default``.

    Multi key: point equi-join on parallel key lists, **no rtrim**, and a miss
    yields NULL regardless of ``default`` (DBT.php:339-341) — asymmetry
    preserved deliberately.
    """

    search_table: str
    search_column: tuple[str, ...]
    according_column: tuple[str, ...]
    wanted_column: str
    search_source: str = SIDE_TARGET
    conditions: tuple[Condition, ...] = ()
    pre_format: Optional[Hook] = None
    format_wanted: Optional[Hook] = None
    #: True forces a broadcast-hash join (the Spark analogue of the
    #: reference's in-driver hash map, DBT.php:300-307); False forbids it;
    #: None (default) lets Catalyst/AQE decide from statistics — the right
    #: call at 100 TB where a "dimension" may not fit an executor.
    broadcast: Optional[bool] = None
    #: skew escape hatch (single-key only): salt the hot keys across N
    #: reducers when the build side can't broadcast and a few keys hold
    #: most probe rows (operators/skew.py).  ``{"salt": 16}`` auto-samples
    #: hot keys; a dict pins them: ``{"salt": {"salts": 16, "hot_keys":
    #: [...], "threshold": 100000}}``.
    salt: Optional["SaltSpec"] = None

    @property
    def is_multi(self) -> bool:
        return len(self.search_column) > 1

    @staticmethod
    def parse(obj: Any, where: str) -> "ReferSpec":
        if not isinstance(obj, dict):
            raise SpecError(f"{where}: refer must be a dict, got {obj!r}")
        try:
            search_table = obj["search_table"]
            wanted_column = obj["wanted_column"]
        except KeyError as e:
            raise SpecError(f"{where}: refer missing key {e}") from None
        search = _as_key_list(obj.get("search_column"), f"{where}.search_column")
        according = _as_key_list(obj.get("according_column"), f"{where}.according_column")
        if len(search) != len(according):
            raise SpecError(
                f"{where}: search_column and according_column must be parallel "
                f"lists, got {len(search)} vs {len(according)}"
            )
        source = obj.get("search_source", SIDE_TARGET)
        if source not in (SIDE_ORIGINAL, SIDE_TARGET):
            raise SpecError(f"{where}: search_source must be original|target, got {source!r}")
        salt = SaltSpec.parse(obj["salt"], where) if obj.get("salt") else None
        if salt is not None and len(search) > 1:
            raise SpecError(f"{where}: salt is only supported on single-key refers")
        return ReferSpec(
            search_table=search_table,
            search_column=search,
            according_column=according,
            wanted_column=wanted_column,
            search_source=source,
            conditions=_parse_conditions(obj.get("conditions"), where),
            pre_format=obj.get("pre_format"),
            format_wanted=obj.get("format_wanted"),
            broadcast=obj.get("broadcast"),
            salt=salt,
        )


@dataclass(frozen=True)
class SaltSpec:
    """Skew-salting parameters for a single-key refer (operators/skew.py)."""

    salts: int = 16
    hot_keys: tuple = ()  # empty → sampled at plan time (hot_key_sample)
    threshold: int = 100_000

    @staticmethod
    def parse(obj: Any, where: str) -> "SaltSpec":
        if isinstance(obj, bool):
            raise SpecError(f"{where}: salt must be an int or dict")
        if isinstance(obj, int):
            return SaltSpec(salts=obj)
        if isinstance(obj, dict):
            return SaltSpec(
                salts=int(obj.get("salts", 16)),
                hot_keys=tuple(obj.get("hot_keys", ())),
                threshold=int(obj.get("threshold", 100_000)),
            )
        raise SpecError(f"{where}: salt must be an int or dict, got {obj!r}")


@dataclass(frozen=True)
class RefersSpec:
    """Grouped-aggregation lookup (J3, DBT.php:227-268; README.md:279-316).

    ``processor`` reduces each group of matching lookup rows to one value: a
    Spark SQL aggregate-expression string over the lookup table's columns
    (e.g. ``"sum(amount)"``) or a Python callable fed ``collect_list(struct(*))``.
    A miss fills ``default`` (unlike J2).
    """

    search_table: str
    search_column: str
    according_column: str
    processor: Hook = None  # required; validated in parse
    search_source: str = SIDE_ORIGINAL
    conditions: tuple[Condition, ...] = ()
    broadcast: Optional[bool] = None

    @staticmethod
    def parse(obj: Any, where: str) -> "RefersSpec":
        if not isinstance(obj, dict):
            raise SpecError(f"{where}: refers must be a dict, got {obj!r}")
        for k in ("search_table", "search_column", "according_column", "processor"):
            if k not in obj:
                raise SpecError(f"{where}: refers missing key {k!r}")
        source = obj.get("search_source", SIDE_ORIGINAL)
        if source not in (SIDE_ORIGINAL, SIDE_TARGET):
            raise SpecError(f"{where}: search_source must be original|target, got {source!r}")
        return RefersSpec(
            search_table=obj["search_table"],
            search_column=obj["search_column"],
            according_column=obj["according_column"],
            processor=obj["processor"],
            search_source=source,
            conditions=_parse_conditions(obj.get("conditions"), where),
            broadcast=obj.get("broadcast"),
        )


@dataclass(frozen=True)
class AsofReferSpec:
    """As-of lookup (extension; no reference analogue): the column takes
    ``wanted_column`` from the latest lookup row with ``search_ts <=
    according_ts`` sharing the key(s).  Miss ⇒ ``default`` (J1-style).

    Determinism: lookup rows sharing (key, search_ts) are reduced to
    ``max(wanted_column)`` before the join, so results never depend on
    partitioning.  ``tolerance`` (e.g. ``"INTERVAL 1 HOUR"``) discards
    matches staler than ``according_ts - tolerance``.
    """

    search_table: str
    on: tuple[str, ...]
    according_ts: str
    search_ts: str
    wanted_column: str
    search_source: str = SIDE_ORIGINAL
    tolerance: Optional[str] = None
    conditions: tuple[Condition, ...] = ()
    #: hot-key escape hatch: a duration ("1 day") splitting each key's
    #: timeline into buckets so no single task sorts a whole hot key
    #: (operators/temporal.py:asof_join bucket param).
    bucket: Optional[str] = None

    @staticmethod
    def parse(obj: Any, where: str) -> "AsofReferSpec":
        if not isinstance(obj, dict):
            raise SpecError(f"{where}: asof_refer must be a dict, got {obj!r}")
        for k in ("search_table", "on", "according_ts", "wanted_column"):
            if k not in obj:
                raise SpecError(f"{where}: asof_refer missing key {k!r}")
        source = obj.get("search_source", SIDE_ORIGINAL)
        if source not in (SIDE_ORIGINAL, SIDE_TARGET):
            raise SpecError(f"{where}: search_source must be original|target, got {source!r}")
        bucket = obj.get("bucket")
        if bucket is not None and not isinstance(bucket, str):
            raise SpecError(f"{where}: bucket must be a duration string")
        return AsofReferSpec(
            search_table=obj["search_table"],
            on=_as_key_list(obj["on"], f"{where}.on"),
            according_ts=obj["according_ts"],
            search_ts=obj.get("search_ts", obj["according_ts"]),
            wanted_column=obj["wanted_column"],
            search_source=source,
            tolerance=obj.get("tolerance"),
            conditions=_parse_conditions(obj.get("conditions"), where),
            bucket=bucket,
        )


@dataclass(frozen=True)
class AffectionSpec:
    """Secondary output of a multi-output transform (P5, DBT.php:396-405)."""

    target_column: str
    source_key: str

    @staticmethod
    def parse_list(obj: Any, where: str) -> tuple["AffectionSpec", ...]:
        if obj is None:
            return ()
        items = obj if isinstance(obj, (list, tuple)) else [obj]
        out = []
        for it in items:
            if not isinstance(it, dict) or "target_column" not in it or "source_key" not in it:
                raise SpecError(
                    f"{where}: affection needs target_column+source_key, got {it!r}"
                )
            out.append(AffectionSpec(it["target_column"], it["source_key"]))
        return tuple(out)


@dataclass(frozen=True)
class ColumnSpec:
    """One target-column define (P1-P6, J1-J3; DBT.php:172-207,390-421)."""

    target: str
    original: Optional[str] = None
    default: Any = None
    has_default: bool = False
    function: Optional[Hook] = None
    affection: tuple[AffectionSpec, ...] = ()
    refer: Optional[ReferSpec] = None
    refers: Optional[RefersSpec] = None
    asof_refer: Optional[AsofReferSpec] = None
    delete_after_transport: bool = False
    rebuild: bool = False
    skip: bool = False

    @staticmethod
    def parse(target: str, obj: Any) -> "ColumnSpec":
        where = f"column {target!r}"
        if obj is None or (isinstance(obj, (dict, list)) and len(obj) == 0):
            # P6: empty define ⇒ skipped (filled by a middle map or left out),
            # DBT.php:173-175.
            return ColumnSpec(target=target, skip=True)
        if isinstance(obj, str):
            # P1: plain rename, DBT.php:176-177.
            return ColumnSpec(target=target, original=obj)
        if not isinstance(obj, dict):
            raise SpecError(f"{where}: define must be a string, dict, or None; got {obj!r}")
        refer = ReferSpec.parse(obj["refer"], where) if obj.get("refer") else None
        refers = RefersSpec.parse(obj["refers"], where) if obj.get("refers") else None
        asof = (AsofReferSpec.parse(obj["asof_refer"], where)
                if obj.get("asof_refer") else None)
        if sum(x is not None for x in (refer, refers, asof)) > 1:
            raise SpecError(f"{where}: refer/refers/asof_refer are mutually exclusive")
        spec = ColumnSpec(
            target=target,
            original=obj.get("original"),
            default=obj.get("default"),
            has_default="default" in obj,
            function=obj.get("function"),
            affection=AffectionSpec.parse_list(obj.get("affection"), where),
            refer=refer,
            refers=refers,
            asof_refer=asof,
            delete_after_transport=bool(obj.get("delete_after_transport", False)),
            rebuild=bool(obj.get("rebuild", False)),
        )
        if spec.function is not None and spec.original is None and refer is None and refers is None:
            # A `function` transform receives the whole source row
            # (DBT.php:395-408) so `original` is only needed to pick the
            # fallback value; allow function-only defines.
            pass
        if (
            spec.original is None
            and spec.function is None
            and refer is None
            and refers is None
            and asof is None
            and not spec.has_default
        ):
            raise SpecError(
                f"{where}: define needs one of original/default/function/"
                "refer/refers/asof_refer"
            )
        return spec


@dataclass(frozen=True)
class MiddleSide:
    """One side of a many-to-many middle map (M1, DBT.php:448-505)."""

    refer_table: str
    wanted_column: str
    fill_column: str
    refer_source: str = SIDE_TARGET
    according_column: Optional[str] = None  # one-side only: the CSV column
    search_column: Optional[str] = None     # many-side only
    search_method: str = "in"               # many-side only (queryComposer op)
    pre_format: Optional[Hook] = None       # one-side: CSV → list
    conditions: tuple[Condition, ...] = ()

    @staticmethod
    def parse(obj: Any, where: str, one_side: bool) -> "MiddleSide":
        if not isinstance(obj, dict):
            raise SpecError(f"{where}: middle side must be a dict, got {obj!r}")
        for k in ("refer_table", "wanted_column", "fill_column"):
            if k not in obj:
                raise SpecError(f"{where}: middle side missing key {k!r}")
        if one_side and "according_column" not in obj:
            raise SpecError(f"{where}: middle one-side needs according_column")
        if not one_side and "search_column" not in obj:
            raise SpecError(f"{where}: middle many-side needs search_column")
        method = str(obj.get("search_method", "in")).replace(" ", "").lower()
        if method not in CONDITION_OPS:
            raise SpecError(f"{where}: unsupported search_method {method!r}")
        source = obj.get("refer_source", SIDE_TARGET)
        if source not in (SIDE_ORIGINAL, SIDE_TARGET):
            raise SpecError(f"{where}: refer_source must be original|target, got {source!r}")
        return MiddleSide(
            refer_table=obj["refer_table"],
            wanted_column=obj["wanted_column"],
            fill_column=obj["fill_column"],
            refer_source=source,
            according_column=obj.get("according_column"),
            search_column=obj.get("search_column"),
            search_method=method,
            pre_format=obj.get("pre_format"),
            conditions=_parse_conditions(obj.get("conditions"), where),
        )


@dataclass(frozen=True)
class MiddleSpec:
    one: MiddleSide
    many: MiddleSide

    @staticmethod
    def parse(obj: Any, where: str) -> "MiddleSpec":
        if not isinstance(obj, dict) or "one" not in obj or "many" not in obj:
            raise SpecError(f"{where}: middle needs 'one' and 'many' sides")
        return MiddleSpec(
            one=MiddleSide.parse(obj["one"], f"{where}.one", one_side=True),
            many=MiddleSide.parse(obj["many"], f"{where}.many", one_side=False),
        )


@dataclass(frozen=True)
class MapSpec:
    """One table-migration map (the reference's per-key map entry)."""

    key: str
    original_table: Optional[str]
    target_table: str
    columns: tuple[ColumnSpec, ...] = ()
    extra_conditions: tuple[Condition, ...] = ()
    order: Optional[OrderSpec] = None
    #: map keys that must migrate first (X2, DBT.php:125-127).  The
    #: reference takes a single key; a list of keys is accepted as a
    #: documented extension — normalized to a tuple at parse time.
    transport_after: tuple[str, ...] = ()
    run_after_transport: Optional[Callable[..., Any]] = None
    middle: Optional[MiddleSpec] = None
    #: extension-surface stages applied after projection/lookups, in order;
    #: each is {"op": <registry name>, ...params} (see operators/post_ops.py)
    post_ops: tuple[dict, ...] = ()

    @property
    def staging_columns(self) -> tuple[str, ...]:
        """Columns flagged delete_after_transport (X5) — dropped pre-write."""
        return tuple(c.target for c in self.columns if c.delete_after_transport)

    def column(self, target: str) -> ColumnSpec:
        for c in self.columns:
            if c.target == target:
                return c
        raise KeyError(target)

    @staticmethod
    def parse(key: str, obj: Any) -> "MapSpec":
        where = f"map {key!r}"
        if not isinstance(obj, dict):
            raise SpecError(f"{where}: must be a dict, got {obj!r}")
        columns_obj = obj.get("columns", {})
        if not isinstance(columns_obj, dict):
            raise SpecError(f"{where}: columns must be a dict")
        columns = tuple(ColumnSpec.parse(t, d) for t, d in columns_obj.items())
        middle = MiddleSpec.parse(obj["middle"], where) if obj.get("middle") else None
        post_ops = obj.get("post_ops", [])
        if not isinstance(post_ops, (list, tuple)):
            raise SpecError(f"{where}: post_ops must be a list of dicts")
        for p in post_ops:
            if not isinstance(p, dict) or "op" not in p:
                raise SpecError(f"{where}: each post_op needs an 'op' key, got {p!r}")
        original_table = obj.get("original_table")
        if original_table is None and middle is None:
            raise SpecError(f"{where}: needs original_table (or a middle spec)")
        after_obj = obj.get("transport_after")
        if after_obj is None:
            transport_after: tuple[str, ...] = ()
        elif isinstance(after_obj, str):
            transport_after = (after_obj,)
        elif isinstance(after_obj, (list, tuple)) and all(
            isinstance(a, str) for a in after_obj
        ):
            transport_after = tuple(after_obj)
        else:
            raise SpecError(
                f"{where}: transport_after must be a map key or list of map"
                f" keys, got {after_obj!r}"
            )
        return MapSpec(
            key=key,
            original_table=original_table,
            # S4: map key is the logical name, target_table overrides the
            # physical sink (DBT.php:129-133,449).
            target_table=obj.get("target_table") or key,
            columns=columns,
            extra_conditions=_parse_conditions(obj.get("extra_conditions"), where),
            order=OrderSpec.parse(obj["order"]) if obj.get("order") else None,
            transport_after=transport_after,
            run_after_transport=obj.get("run_after_transport"),
            middle=middle,
            post_ops=tuple(post_ops),
        )


def parse_maps(maps: dict[str, Any]) -> dict[str, MapSpec]:
    """Validate and normalize a raw ``$maps``-style dict."""
    if not isinstance(maps, dict) or not maps:
        raise SpecError("maps must be a non-empty dict")
    return {key: MapSpec.parse(key, obj) for key, obj in maps.items()}
