"""post_ops registry — the extension surface as declarative map stages.

A map spec may carry ``"post_ops": [{"op": name, ...params}, ...]``; the
planner applies each stage to the map's DataFrame after projection and
lookups, in order.  This is what makes the LLM-pipeline operators part of
the same declarative planner as the reference-parity operators: a spec can
migrate a table AND dedup/score/fingerprint it in one plan, all lazy, all
Catalyst-optimized together.

Built-in stages (each a thin adapter over ``operators/``):

    {"op": "exact_dedup", "keys": [...], "order_by": col, "keep": "min"}
    {"op": "quality_score", "text_col": "text"}
    {"op": "text_stats", "text_col": "text"}
    {"op": "language_id", "text_col": "text"}
    {"op": "fingerprint", "text_col": "text", "k": 8}
    {"op": "token_count", "text_col": "text"}
    {"op": "repetition_stats", "id_col": "doc_id", "text_col": "text"}
    {"op": "split_assign", "id_col": "doc_id", "weights": {...}, "hash_fn": ...}
    {"op": "stratified_sample", "strata_cols": [...], "k": N, "id_col": ...}
    {"op": "pack_sequences", "id_col": ..., "tokens_col": ..., "budget": N}
    {"op": "redact_pii", "text_col": "text"}
    {"op": "sessionize", "gap": "30 minutes", "user_col": ..., "ts_col": ...}
    {"op": "scd2", "keys": [...], "ts_col": ..., "attr_cols": [...]}
    {"op": "check", "rules": [...]}      # data-quality gate, raises on fail
    {"op": "filter", "condition": "<sql expr>"}
    {"op": "select", "columns": [...]}
    {"op": "weighted_sample", "id_col": ..., "prob": "<sql expr>"}
    {"op": "sample_per_group", "id_col": ..., "group_cols": [...], "k": N}
    {"op": "gap_fill", "keys": [...], "ts_col": ..., "step": "1 day",
     "value_cols": [...]}
    {"op": "heavy_hitters", "value_col": ..., "k": N}
    {"op": "boilerplate_ratio", "id_col": ..., "text_col": ...}
    {"op": "winsorize", "value_col": ..., "group_cols": [...]}
    {"op": "k_anonymity_gate", "quasi_cols": [...], "k": N}  # raises
    {"op": "funnel", "stages": [...], "user_col": ..., "ts_col": ...,
     "max_events_per_entity": N}
    {"op": "cohort_retention", "user_col": ..., "ts_col": ..., "period": ...}
    {"op": "transition_matrix", "entity_col": ..., "type_col": ...}
    {"op": "top_paths", "user_col": ..., "type_col": ..., "max_len": N}
    {"op": "pagerank", "src": ..., "dst": ..., "iterations": N}
    {"op": "triangle_count", "src": ..., "dst": ..., "orient": "degree"}
    {"op": "cube_agg", "dims": [...], "measures": ["sum(v) AS s", ...]}
    {"op": "growth_accounting", "entity_col": ..., "bucket": "day"}
    {"op": "ewma", "key_cols": [...], "ts_col": ..., "value_col": ...,
     "alpha": 0.5}
    {"op": "decode_image", "id_col": ..., "content_col": ..., "errors": ...}
    {"op": "decode_audio", "id_col": ..., "content_col": ..., "errors": ...}
    {"op": "random_projection", "vec_col": ..., "out_dim": N, "seed": 0}
    {"op": "bpe_encode", "text_col": ..., "merges": [[rank, l, r], ...]}
    {"op": "dedup_lines", "text_col": ..., "sep": "\\n"}
    {"op": "temperature_weights", "domain_col": ..., "temperature": T}
    {"op": "char_entropy", "id_col": ..., "text_col": ...}
    {"op": "dedup_paragraphs", "text_col": ..., "sep": "\\n", "max_docs": 1,
     "keep": "none|first"}
    {"op": "kmeans", "id_col": ..., "vec_col": ..., "k": 8, "iters": 2}
    {"op": "drop_contained_docs", "id_col": ..., "text_col": ..., "threshold": 0.9}
    {"op": "cusum", "key_cols": [...], "ts_col": ..., "value_col": ...,
     "threshold": N, "target": N}
    {"op": "cooccurrence_pairs", "basket_col": ..., "item_col": ...,
     "min_pair_count": N, "max_basket": N}
    {"op": "inverted_index", "id_col": ..., "text_col": ..., "min_df": N,
     "max_postings": N}
    {"op": "rolling_distinct", "ts_col": ..., "entity_col": ...,
     "window_buckets": N, "bucket": "day"}
    {"op": "ab_test", "variant_col": ..., "entity_col": ..., "converted": "<sql>"}
    {"op": "normalize_urls", "url_col": "url", "out_col": "url_norm"}
    {"op": "corpus_report", "text_col": ..., "lang_col": ..., "chars_col": ...}
    {"op": "join_size", "table": ..., "left_keys": [...], "right_keys": [...],
     "top_k": N}                         # pre-join cardinality diagnostic
    {"op": "linear_fit", "x_col": ..., "y_col": ..., "group_cols": [...]}
    {"op": "linear_fit_multi", "feature_cols": [...], "label_col": ...,
     "group_cols": [...], "ridge": 0.0}
    {"op": "kmv_distinct", "keys": [...], "value_col": ..., "k": 512}
    {"op": "hist_quantiles", "keys": [...], "value_col": ..., "lo": L,
     "hi": H, "bins": 64, "qs": [0.5, 0.95], "log": False}
    {"op": "approx_agg", "keys": [...], "fraction": 0.1,
     "measures": {"n": ["count"], "rev": ["sum", "price"]}}
    {"op": "image_dups", "id_col": ..., "content_col": ..., "max_hamming": 6}
    {"op": "audio_dups", "id_col": ..., "content_col": ..., "max_hamming": 6}
    {"op": "shortest_paths", "landmarks": [...], "src": ..., "dst": ...,
     "directed": True, "max_iterations": 20}
    {"op": "weighted_paths", "landmarks": [...], "weight": ..., "hops": 10}
    {"op": "label_propagation", "src": ..., "dst": ..., "iterations": 5}
    {"op": "edit_join", "id_col": ..., "text_col": ..., "max_distance": 2,
     "table": "<other table, optional — self-join when omitted>"}
    {"op": "seasonal_decompose", "keys": [...], "ts_col": ...,
     "value_col": ..., "period": P}
    {"op": "kaplan_meier", "duration_col": ..., "event_col": ...,
     "group_cols": [...]}
    {"op": "quantile_bin", "value_col": ..., "n_buckets": N,
     "group_cols": [...]}
    {"op": "vocab_coverage", "vocab_table": ..., "side": "original",
     "text_col": "text", "id_col": "doc_id"}
    {"op": "asof_refer_forward", "table": ..., "on": [...],
     "left_ts": ..., "tolerance": ..., "select": [...]}
    {"op": "hybrid_retrieve", "corpus_table"|"index_table": ...,
     "embeddings_table": ..., "k": 10, "topk": 10, "rrf_k": 60,
     "weights": [w_lex, w_sem], "semantic": "brute"|"ivf",
     "exclude_self": bool, "stats_table": ...}  # df = the query set

Relational stages (the declarative analytics tier — the same generic
relational algebra the Q-shaped queries compile to, so a spec can express
a full scan→join→derive→aggregate→rank report without any Python
DataFrame code):

    {"op": "derive", "columns": {"name": "<sql expr>", ...}}   # ordered
    {"op": "join", "table": ..., "side": "original"|"target", "on": "<sql>"
     | [cols], "how": "inner", "broadcast": bool, "filter": "<sql>",
     "select": ["<expr>", ...], "distinct": bool}
    {"op": "agg", "group_by": ["<expr [AS name]>", ...], "aggs": [...]}
    {"op": "window_rank", "order_by": ["<expr> desc", ...],
     "partition_by": [...], "rank_col": "rank", "method": "row_number",
     "top": N}
    {"op": "window_agg", "partition_by": [...],
     "aggs": {"out_col": "<agg expr>", ...}}
    {"op": "order_limit", "by": ["<expr> [desc]", ...], "limit": N}
    {"op": "distinct", "subset": [...]}                        # optional
    {"op": "union", "table": ..., "side": ..., "filter": "<sql>",
     "select": [...], "by_name": True, "allow_missing": False}
    {"op": "pivot", "group_cols": [...], "pivot_col": ..., "values": [...],
     "agg": "count|sum|min|max|avg", "value_col": ..., "fill": 0}
    {"op": "unpivot", "id_cols": [...], "value_cols": [...],
     "var_name": "metric", "value_name": "value"}

``join`` resolves its right side through the engine's catalog resolver
(the reserved ``_resolve`` param injected by :func:`apply_post_ops`):
``side: "original"`` reads the source catalog; ``side: "target"`` sees
earlier maps' outputs first (declare ``transport_after`` so the planner
orders the DAG), falling back to the target catalog — so a multi-stage
declarative report can join a pre-aggregated upstream map exactly like
the reference's recursive-dependency trigger (J4) does for lookups.

Register custom stages with :func:`register_post_op`; the callable gets
``(df, params)`` and returns the new DataFrame.  Params starting with
``_`` are reserved for engine-injected context — custom stages receive
NONE of them unless registered with ``register_post_op(name,
context=True)``, which opts in to ``_resolve``/``_where``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..spec import SpecError

__all__ = ["apply_post_ops", "register_post_op", "POST_OPS"]

PostOp = Callable[[DataFrame, dict], DataFrame]

POST_OPS: dict[str, PostOp] = {}

# Stages that receive the engine-injected ``_resolve``/``_where`` context
# keys.  Built-ins are all context-aware (they use ``_where`` for error
# provenance); user-registered stages must opt in with ``context=True`` —
# otherwise their params dict carries ONLY the spec's own keys, so strict
# param validation in pre-existing custom handlers keeps working.
_CONTEXT_OPS: set[str] = set()


def register_post_op(name: str, context: bool = False):
    def deco(fn: PostOp) -> PostOp:
        POST_OPS[name] = fn
        if context:
            _CONTEXT_OPS.add(name)
        else:
            _CONTEXT_OPS.discard(name)
        return fn

    return deco


def apply_post_ops(
    df: DataFrame,
    post_ops: tuple[dict, ...],
    where: str,
    resolve: Callable[[str, str], DataFrame] | None = None,
) -> DataFrame:
    """Apply the stages in order.  ``resolve(side, table)`` is the engine's
    catalog resolver; it is injected under the reserved ``_resolve`` key
    into BUILT-IN stages and custom stages registered with
    ``context=True`` (so relational stages like ``join`` read other
    tables / upstream map outputs through the same resolution path as
    lookups) — plain custom stages receive only the spec's own params."""
    for spec in post_ops:
        params = {k: v for k, v in spec.items() if k != "op"}
        name = spec["op"]
        if name not in POST_OPS:
            raise SpecError(
                f"{where}: unknown post_op {name!r} (known: {sorted(POST_OPS)})"
            )
        if name in _CONTEXT_OPS:
            params["_resolve"] = resolve
            params["_where"] = where
        df = POST_OPS[name](df, params)
    return df


@register_post_op("exact_dedup")
def _exact_dedup(df: DataFrame, p: dict) -> DataFrame:
    from .dedup import exact_dedup

    return exact_dedup(df, keys=p["keys"], order_by=p["order_by"],
                       keep=p.get("keep", "min"))


@register_post_op("quality_score")
def _quality(df: DataFrame, p: dict) -> DataFrame:
    from .text import quality_score

    return quality_score(df, p.get("text_col", "text"))


@register_post_op("text_stats")
def _stats(df: DataFrame, p: dict) -> DataFrame:
    from .text import text_stats

    return text_stats(df, p.get("text_col", "text"))


@register_post_op("language_id")
def _lang(df: DataFrame, p: dict) -> DataFrame:
    from .text import language_id

    return language_id(df, p.get("text_col", "text"))


@register_post_op("fingerprint")
def _fp(df: DataFrame, p: dict) -> DataFrame:
    from .text import fingerprint

    return fingerprint(df, p.get("text_col", "text"), k=p.get("k", 8))


@register_post_op("token_count")
def _tc(df: DataFrame, p: dict) -> DataFrame:
    from .text import token_count

    return token_count(df, p.get("text_col", "text"))


@register_post_op("repetition_stats")
def _rep(df: DataFrame, p: dict) -> DataFrame:
    from .text import repetition_stats

    return repetition_stats(df, p.get("id_col", "doc_id"), p.get("text_col", "text"))


@register_post_op("filter")
def _filter(df: DataFrame, p: dict) -> DataFrame:
    return df.filter(F.expr(p["condition"]))


@register_post_op("select")
def _select(df: DataFrame, p: dict) -> DataFrame:
    return df.select(*p["columns"])


@register_post_op("split_assign")
def _split(df: DataFrame, p: dict) -> DataFrame:
    from .corpus import split_assign

    return split_assign(
        df,
        p["id_col"],
        p.get("weights"),
        salt=p.get("salt", 0),
        hash_fn=p.get("hash_fn", "xxhash64"),
        out_col=p.get("out_col", "split"),
    )


@register_post_op("stratified_sample")
def _strat(df: DataFrame, p: dict) -> DataFrame:
    from .corpus import stratified_sample

    return stratified_sample(
        df, p["strata_cols"], p["k"], p["id_col"],
        salt=p.get("salt", 0), hash_fn=p.get("hash_fn", "xxhash64"),
    )


@register_post_op("pack_sequences")
def _pack(df: DataFrame, p: dict) -> DataFrame:
    from .corpus import pack_sequences

    return pack_sequences(
        df, p["id_col"], p["tokens_col"], p["budget"],
        group_cols=p.get("group_cols"), out_col=p.get("out_col", "pack_id"),
    )


@register_post_op("redact_pii")
def _redact(df: DataFrame, p: dict) -> DataFrame:
    from .corpus import redact_pii

    return redact_pii(
        df, p.get("text_col", "text"), patterns=p.get("patterns"),
        out_col=p.get("out_col"), count_cols=p.get("count_cols", True),
    )


@register_post_op("approx_distinct")
def _approx_distinct(df: DataFrame, p: dict) -> DataFrame:
    from .sketches import approx_distinct

    return approx_distinct(
        df, p["keys"], p["col"], rsd=p.get("rsd", 0.02),
        out_col=p.get("out_col", "approx_distinct"),
    )


@register_post_op("grouped_median")
def _grouped_median(df: DataFrame, p: dict) -> DataFrame:
    from .sketches import grouped_median

    return grouped_median(df, p["keys"], p["col"],
                          out_col=p.get("out_col", "median"))

@register_post_op("corpus_shuffle")
def _corpus_shuffle(df: DataFrame, p: dict) -> DataFrame:
    from .corpus import corpus_shuffle

    return corpus_shuffle(
        df, p["id_col"], p["n_shards"],
        seed=p.get("seed", 0), hash_fn=p.get("hash_fn", "xxhash64"),
    )


@register_post_op("export_shards")
def _export_shards(df: DataFrame, p: dict) -> DataFrame:
    """Terminal export stage: materialize the curated frame as one-file-
    per-shard training shards at ``path`` and pass the MANIFEST (the
    export receipt) downstream as the map's output — so "curate →
    export" is one spec, and the transported target table holds the
    per-shard manifest for audit/joining rather than the (path-
    addressed) payload itself."""
    from .corpus import export_shards

    return export_shards(
        df, p["path"], p["id_col"], p["n_shards"],
        seed=p.get("seed", 0), hash_fn=p.get("hash_fn", "xxhash64"),
        token_col=p.get("token_col"), mode=p.get("mode", "error"),
        format=p.get("format", "parquet"),
    )


@register_post_op("verify_export")
def _verify_export(df: DataFrame, p: dict) -> DataFrame:
    """Audit stage: the input frame IS the stored manifest (e.g. the
    transported output of an ``export_shards`` stage read back from the
    catalog); the stage recounts the shards at ``path`` and outputs the
    discrepancy rows — empty output = export intact."""
    from .corpus import verify_export

    return verify_export(
        df.sparkSession, p["path"], df, p["id_col"],
        seed=p.get("seed", 0), hash_fn=p.get("hash_fn", "xxhash64"),
        token_col=p.get("token_col"), format=p.get("format", "parquet"),
    )


@register_post_op("upsample_domains")
def _upsample_domains(df: DataFrame, p: dict) -> DataFrame:
    from .corpus import upsample_domains

    return upsample_domains(
        df, p["domain_col"], p["weights"], p["id_col"],
        salt=p.get("salt", 0), hash_fn=p.get("hash_fn", "xxhash64"),
        default_weight=p.get("default_weight", 1.0),
    )


@register_post_op("quantize_embeddings")
def _quantize_embeddings(df: DataFrame, p: dict) -> DataFrame:
    from .similarity import quantize_embeddings

    return quantize_embeddings(
        df, p["vec_col"], id_col=p.get("id_col"),
        out_col=p.get("out_col", "qvec"), scale_col=p.get("scale_col", "qscale"),
        rounding=p.get("rounding", "floor"),
    )


@register_post_op("sessionize")
def _sessionize(df: DataFrame, p: dict) -> DataFrame:
    from .funnel import sessionize

    return sessionize(
        df, gap=p.get("gap", "30 minutes"),
        user_col=p.get("user_col", "user_id"), ts_col=p.get("ts_col", "ts"),
    )


@register_post_op("scd2")
def _scd2(df: DataFrame, p: dict) -> DataFrame:
    from .temporal import build_scd2

    return build_scd2(
        df, p["keys"], p["ts_col"],
        attr_cols=p.get("attr_cols"), collapse=p.get("collapse", True),
    )


@register_post_op("check")
def _check(df: DataFrame, p: dict) -> DataFrame:
    # validation as a pipeline stage: pass-through on success, raises
    # ValidationError on the first action that materializes the plan
    # (rules run eagerly here — the report is tiny and failing early
    # beats failing inside the sink write)
    from .validate import check

    check(df, p["rules"])
    return df


@register_post_op("weighted_sample")
def _weighted_sample(df: DataFrame, p: dict) -> DataFrame:
    from .corpus import weighted_sample

    return weighted_sample(
        df,
        p["id_col"],
        F.expr(p["prob"]),
        salt=p.get("salt", 0),
        hash_fn=p.get("hash_fn", "xxhash64"),
    )


@register_post_op("sample_per_group")
def _sample_per_group(df: DataFrame, p: dict) -> DataFrame:
    from .corpus import sample_per_group

    return sample_per_group(
        df,
        p["id_col"],
        p["group_cols"],
        p["k"],
        salt=p.get("salt", 0),
        hash_fn=p.get("hash_fn", "xxhash64"),
    )


@register_post_op("gap_fill")
def _gap_fill(df: DataFrame, p: dict) -> DataFrame:
    from .temporal import gap_fill

    return gap_fill(
        df,
        p["keys"],
        p["ts_col"],
        p.get("step", "1 day"),
        value_cols=p.get("value_cols"),
        fill=p.get("fill", 0),
    )


@register_post_op("heavy_hitters")
def _heavy_hitters(df: DataFrame, p: dict) -> DataFrame:
    from .sketches import heavy_hitters

    return heavy_hitters(
        df,
        p["value_col"],
        group_cols=p.get("group_cols"),
        k=p.get("k", 10),
        exact=p.get("exact", True),
        support=p.get("support", 0.01),
    )


@register_post_op("boilerplate_ratio")
def _boilerplate(df: DataFrame, p: dict) -> DataFrame:
    from .text import boilerplate_ratio

    return boilerplate_ratio(
        df,
        p.get("id_col", "doc_id"),
        p.get("text_col", "text"),
        n=p.get("n", 3),
        min_df=p.get("min_df", 2),
    )


@register_post_op("winsorize")
def _winsorize(df: DataFrame, p: dict) -> DataFrame:
    from .corpus import winsorize

    return winsorize(
        df,
        p["value_col"],
        p.get("group_cols"),
        p_lo=p.get("p_lo", 0.01),
        p_hi=p.get("p_hi", 0.99),
        out_col=p.get("out_col"),
    )


@register_post_op("k_anonymity_gate")
def _k_anonymity_gate(df: DataFrame, p: dict) -> DataFrame:
    # gate stage: pass-through when k-anonymous, raise naming the worst
    # offenders otherwise (mirrors the "check" stage's eager contract)
    from .validate import ValidationError, k_anonymity

    k = p.get("k", 5)
    bad = k_anonymity(df, p["quasi_cols"], k=k).orderBy("group_size").limit(5).collect()
    if bad:
        raise ValidationError(
            [
                (
                    f"k_anonymity<{k}",
                    "(" + ", ".join(str(r[c]) for c in p["quasi_cols"]) + ")",
                    int(r["group_size"]),
                )
                for r in bad
            ]
        )
    return df


@register_post_op("funnel")
def _funnel(df: DataFrame, p: dict) -> DataFrame:
    from .funnel import funnel

    return funnel(
        df,
        p["stages"],
        user_col=p.get("user_col", "user_id"),
        ts_col=p.get("ts_col", "ts"),
        type_col=p.get("type_col", "event_type"),
        horizon=p.get("horizon"),
        max_events_per_entity=p.get("max_events_per_entity"),
    )


@register_post_op("cohort_retention")
def _cohort_retention(df: DataFrame, p: dict) -> DataFrame:
    from .funnel import cohort_retention

    return cohort_retention(
        df,
        user_col=p.get("user_col", "user_id"),
        ts_col=p.get("ts_col", "ts"),
        period=p.get("period", "week"),
    )


@register_post_op("transition_matrix")
def _transition_matrix(df: DataFrame, p: dict) -> DataFrame:
    from .funnel import transition_matrix

    return transition_matrix(
        df,
        entity_col=p.get("entity_col", "user_id"),
        type_col=p.get("type_col", "event_type"),
        ts_col=p.get("ts_col", "ts"),
        tiebreak_col=p.get("tiebreak_col"),
        round_digits=p.get("round_digits", 6),
    )


@register_post_op("top_paths")
def _top_paths(df: DataFrame, p: dict) -> DataFrame:
    from .funnel import top_paths

    return top_paths(
        df,
        p.get("user_col", "user_id"),
        p.get("type_col", "event_type"),
        p.get("ts_col", "ts"),
        max_len=p.get("max_len", 5),
        k=p.get("k", 20),
        tiebreak_col=p.get("tiebreak_col"),
        sep=p.get("sep", ">"),
    )


@register_post_op("pagerank")
def _pagerank(df: DataFrame, p: dict) -> DataFrame:
    from .graph import pagerank

    return pagerank(
        df,
        src=p.get("src", "src"),
        dst=p.get("dst", "dst"),
        iterations=p.get("iterations", 10),
        damping=p.get("damping", 0.85),
        handle_dangling=p.get("handle_dangling", True),
        checkpoint_every=p.get("checkpoint_every", 5),
        dedup_edges=p.get("dedup_edges", True),
    )


@register_post_op("cube_agg")
def _cube_agg(df: DataFrame, p: dict) -> DataFrame:
    from .rollup import cube_agg

    # measures are SQL aggregate expression strings ("sum(v) AS sum_v") —
    # the same expression-first contract as the reference's hook surface
    return cube_agg(
        df,
        p["dims"],
        [F.expr(m) if isinstance(m, str) else m for m in p["measures"]],
        mode=p.get("mode", "cube"),
        sets=p.get("sets"),
        gid_col=p.get("gid_col", "gid"),
    )


@register_post_op("growth_accounting")
def _growth_accounting(df: DataFrame, p: dict) -> DataFrame:
    from .funnel import growth_accounting

    return growth_accounting(
        df,
        entity_col=p.get("entity_col", "user_id"),
        ts_col=p.get("ts_col", "ts"),
        bucket=p.get("bucket", "day"),
    )


@register_post_op("ewma")
def _ewma(df: DataFrame, p: dict) -> DataFrame:
    from .temporal import ewma

    return ewma(
        df,
        p["key_cols"],
        p["ts_col"],
        p["value_col"],
        p["alpha"],
        out_col=p.get("out_col", "ewma"),
        tiebreak_col=p.get("tiebreak_col"),
        max_points_per_key=p.get("max_points_per_key"),
    )


@register_post_op("decode_image")
def _decode_image(df: DataFrame, p: dict) -> DataFrame:
    from .multimodal import decode_image

    return decode_image(
        df,
        id_col=p.get("id_col", "doc_id"),
        content_col=p.get("content_col", "content"),
        errors=p.get("errors", "raise"),
        with_pixels=p.get("with_pixels", False),
    )


@register_post_op("decode_audio")
def _decode_audio(df: DataFrame, p: dict) -> DataFrame:
    from .multimodal import decode_audio

    return decode_audio(
        df,
        id_col=p.get("id_col", "doc_id"),
        content_col=p.get("content_col", "content"),
        errors=p.get("errors", "raise"),
    )


@register_post_op("triangle_count")
def _triangle_count(df: DataFrame, p: dict) -> DataFrame:
    from .graph import triangle_count

    return triangle_count(
        df,
        src=p.get("src", "src"),
        dst=p.get("dst", "dst"),
        orient=p.get("orient", "degree"),
    )


@register_post_op("random_projection")
def _random_projection(df: DataFrame, p: dict) -> DataFrame:
    from .similarity import random_projection

    return random_projection(
        df,
        p["vec_col"],
        p["out_dim"],
        seed=p.get("seed", 0),
        out_col=p.get("out_col", "proj"),
        scale=p.get("scale", 1_000_000),
    )


@register_post_op("bpe_encode")
def _bpe_encode(df: DataFrame, p: dict) -> DataFrame:
    # merges as a literal [[rank, left, right], ...] list — specs are
    # declarative data, so the trained table is inlined, not a DataFrame
    from .text import bpe_encode

    return bpe_encode(
        df,
        text_col=p.get("text_col", "text"),
        merges=[tuple(m) for m in p["merges"]],
        out_col=p.get("out_col", "bpe_tokens"),
        end_of_word=p.get("end_of_word", "</w>"),
    )


@register_post_op("dedup_lines")
def _dedup_lines(df: DataFrame, p: dict) -> DataFrame:
    from .text import dedup_lines

    return dedup_lines(
        df,
        text_col=p.get("text_col", "text"),
        sep=p.get("sep", "\n"),
        out_col=p.get("out_col"),
        count_col=p.get("count_col", "n_lines_removed"),
    )


@register_post_op("temperature_weights")
def _temperature_weights(df: DataFrame, p: dict) -> DataFrame:
    from .corpus import temperature_weights

    return temperature_weights(
        df,
        p["domain_col"],
        temperature=p.get("temperature", 1.0),
        round_digits=p.get("round_digits", 6),
    )


@register_post_op("char_entropy")
def _char_entropy(df: DataFrame, p: dict) -> DataFrame:
    from .text import char_entropy

    return char_entropy(
        df,
        id_col=p.get("id_col", "doc_id"),
        text_col=p.get("text_col", "text"),
        out_col=p.get("out_col", "char_entropy"),
    )


@register_post_op("dedup_paragraphs")
def _dedup_paragraphs(df: DataFrame, p: dict) -> DataFrame:
    from .text import dedup_paragraphs

    return dedup_paragraphs(
        df,
        id_col=p.get("id_col", "doc_id"),
        text_col=p.get("text_col", "text"),
        sep=p.get("sep", "\n"),
        max_docs=p.get("max_docs", 1),
        keep=p.get("keep", "none"),
        out_col=p.get("out_col"),
        count_col=p.get("count_col", "n_paras_removed"),
    )


@register_post_op("drop_contained_docs")
def _drop_contained(df: DataFrame, p: dict) -> DataFrame:
    from .dedup import drop_contained_docs

    return drop_contained_docs(
        df,
        p.get("id_col", "doc_id"),
        p.get("text_col", "text"),
        n=p.get("n", 3),
        threshold=p.get("threshold", 0.9),
        max_df=p.get("max_df"),
    )


@register_post_op("kmeans")
def _kmeans(df: DataFrame, p: dict) -> DataFrame:
    from .similarity import kmeans_lloyd

    return kmeans_lloyd(
        df,
        id_col=p.get("id_col", "vec_id"),
        vec_col=p.get("vec_col", "embedding"),
        k=p.get("k", 8),
        iters=p.get("iters", 2),
        scale=p.get("scale", 10**6),
    )


@register_post_op("cusum")
def _cusum(df: DataFrame, p: dict) -> DataFrame:
    from .temporal import cusum

    return cusum(
        df,
        p["key_cols"],
        p["ts_col"],
        p["value_col"],
        threshold=p["threshold"],
        target=p.get("target"),
        out_col=p.get("out_col", "cusum"),
        flag_col=p.get("flag_col", "is_shift"),
        max_points_per_key=p.get("max_points_per_key"),
    )


@register_post_op("cooccurrence_pairs")
def _cooccurrence_pairs(df: DataFrame, p: dict) -> DataFrame:
    from .affinity import cooccurrence_pairs

    return cooccurrence_pairs(
        df,
        p["basket_col"],
        p["item_col"],
        min_pair_count=p.get("min_pair_count", 1),
        max_basket=p.get("max_basket"),
    )


@register_post_op("inverted_index")
def _inverted_index(df: DataFrame, p: dict) -> DataFrame:
    from .text import inverted_index

    return inverted_index(
        df,
        p.get("id_col", "doc_id"),
        p.get("text_col", "text"),
        min_df=p.get("min_df", 1),
        max_postings=p.get("max_postings", 20),
    )


@register_post_op("rolling_distinct")
def _rolling_distinct(df: DataFrame, p: dict) -> DataFrame:
    from .temporal import rolling_distinct

    return rolling_distinct(
        df,
        p["ts_col"],
        p["entity_col"],
        window_buckets=p.get("window_buckets", 7),
        bucket=p.get("bucket", "day"),
        group_cols=p.get("group_cols"),
        out_col=p.get("out_col", "active"),
    )


@register_post_op("ab_test")
def _ab_test(df: DataFrame, p: dict) -> DataFrame:
    from .experiment import ab_test

    return ab_test(
        df, p["variant_col"], p["entity_col"], p["converted"]
    )


@register_post_op("normalize_urls")
def _normalize_urls(df: DataFrame, p: dict) -> DataFrame:
    from .corpus import normalize_urls

    return normalize_urls(
        df,
        url_col=p.get("url_col", "url"),
        out_col=p.get("out_col", "url_norm"),
        host_col=p.get("host_col", "url_host"),
        domain_col=p.get("domain_col", "url_domain"),
        tracking_params=tuple(p["tracking_params"]) if p.get("tracking_params")
        else ("utm_[^&#=]*", "gclid", "fbclid", "ref", "mc_eid"),
    )


@register_post_op("join_size")
def _join_size(df: DataFrame, p: dict) -> DataFrame:
    # pre-join cardinality diagnostic: current frame is the left side,
    # the right side resolves through the engine catalog like "join"
    from .skew import join_size_report

    resolve = p.get("_resolve")
    if resolve is None:
        raise SpecError(
            f"{p.get('_where', 'post_ops')}: 'join_size' needs the engine's "
            "catalog resolver (run the spec through DBT)"
        )
    right = resolve(p.get("side", "original"), p["table"])
    if p.get("filter"):
        right = right.filter(F.expr(p["filter"]))
    return join_size_report(
        df, right, p["left_keys"], p.get("right_keys"),
        top_k=p.get("top_k", 10),
    )


# ---------------------------------------------------------------------------
# Relational tier — generic scan→join→derive→aggregate→rank stages.  These
# compile 1:1 to stock DataFrame ops, so a declarative spec gets the exact
# plan (pushdown, broadcast, map-side partial agg, TakeOrdered) a
# hand-written composition would.
# ---------------------------------------------------------------------------


def _sort_expr(item: str):
    """Parse '<expr> [asc|desc] [nulls first|nulls last]' into a sort Column
    (F.expr parses expressions, not sort items, so the suffixes are split
    off here)."""
    s = item.strip()
    low = s.lower()
    nulls = None
    for suf, kind in ((" nulls first", "first"), (" nulls last", "last")):
        if low.endswith(suf):
            nulls, s, low = kind, s[: -len(suf)].rstrip(), low[: -len(suf)].rstrip()
            break
    desc = False
    for suf, d in ((" desc", True), (" asc", False)):
        if low.endswith(suf):
            desc, s = d, s[: -len(suf)].rstrip()
            break
    col = F.expr(s)
    if desc:
        return col.desc_nulls_first() if nulls == "first" else (
            col.desc_nulls_last() if nulls == "last" else col.desc()
        )
    return col.asc_nulls_first() if nulls == "first" else (
        col.asc_nulls_last() if nulls == "last" else col.asc()
    )


@register_post_op("derive")
def _derive(df: DataFrame, p: dict) -> DataFrame:
    # Ordered: each expression sees the columns derived before it (dicts
    # preserve insertion order).  SQL-expression-first, like the reference's
    # hook surface — no Python executes per row.
    cols = p.get("columns")
    if not isinstance(cols, dict) or not cols:
        raise SpecError(
            f"{p.get('_where', 'post_ops')}: 'derive' needs a non-empty "
            "columns dict of name -> SQL expression"
        )
    for name, expr in cols.items():
        df = df.withColumn(name, F.expr(expr))
    return df


@register_post_op("join")
def _join(df: DataFrame, p: dict) -> DataFrame:
    resolve = p.get("_resolve")
    if resolve is None:
        raise SpecError(
            f"{p.get('_where', 'post_ops')}: 'join' needs the engine's catalog "
            "resolver — run the spec through DBT (or pass resolve= to "
            "apply_post_ops)"
        )
    right = resolve(p.get("side", "original"), p["table"])
    if p.get("filter"):
        right = right.filter(F.expr(p["filter"]))
    if p.get("select"):
        right = right.selectExpr(*p["select"])
    if p.get("distinct"):
        right = right.distinct()
    if p.get("broadcast"):
        right = F.broadcast(right)
    how = p.get("how", "inner")
    on = p.get("on")
    if on is None:
        if how != "cross":
            raise SpecError(
                f"{p.get('_where', 'post_ops')}: 'join' without 'on' is only "
                "valid with how='cross'"
            )
        return df.crossJoin(right)
    cond = on if isinstance(on, (list, tuple)) else F.expr(on)
    if isinstance(cond, (list, tuple)):
        cond = list(cond)
    return df.join(right, on=cond, how=how)


@register_post_op("agg")
def _agg(df: DataFrame, p: dict) -> DataFrame:
    if not p.get("aggs"):
        raise SpecError(
            f"{p.get('_where', 'post_ops')}: 'agg' needs a non-empty aggs "
            "list of SQL aggregate expressions"
        )
    aggs = [F.expr(a) for a in p["aggs"]]
    group_by = [F.expr(g) for g in p.get("group_by", [])]
    return df.groupBy(*group_by).agg(*aggs) if group_by else df.agg(*aggs)


@register_post_op("window_rank")
def _window_rank(df: DataFrame, p: dict) -> DataFrame:
    # row_number/rank/dense_rank over (partition_by, order_by); with "top"
    # and no partition_by Catalyst rewrites the filter into a
    # TakeOrderedAndProject-style top-k per partition + single merge — no
    # global sort materialization.
    from pyspark.sql import Window

    method = p.get("method", "row_number")
    fns = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}
    if method not in fns:
        raise SpecError(
            f"{p.get('_where', 'post_ops')}: window_rank method must be one "
            f"of {sorted(fns)}, got {method!r}"
        )
    w = Window.partitionBy(*[F.expr(c) for c in p.get("partition_by", [])])
    w = w.orderBy(*[_sort_expr(o) for o in p["order_by"]])
    out = df.withColumn(p.get("rank_col", "rank"), fns[method]().over(w))
    if p.get("top") is not None:
        out = out.filter(F.col(p.get("rank_col", "rank")) <= int(p["top"]))
    return out


@register_post_op("window_agg")
def _window_agg(df: DataFrame, p: dict) -> DataFrame:
    # per-partition analytic aggregates kept on every row (count/sum/min/...
    # OVER (PARTITION BY ...)) — the declarative form of the "aggregate once,
    # compare within the group" rewrite that replaces correlated EXISTS
    # self-joins.  No order_by → whole-partition frame.
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.expr(c) for c in p["partition_by"]])
    if p.get("order_by"):
        w = w.orderBy(*[_sort_expr(o) for o in p["order_by"]])
    for out_col, agg_expr in p["aggs"].items():
        df = df.withColumn(out_col, F.expr(agg_expr).over(w))
    return df


@register_post_op("order_limit")
def _order_limit(df: DataFrame, p: dict) -> DataFrame:
    # orderBy(...).limit(n) compiles to TakeOrderedAndProject: per-partition
    # top-n + one driver merge of n rows — never a full global sort.
    out = df.orderBy(*[_sort_expr(o) for o in p["by"]])
    if p.get("limit") is not None:
        out = out.limit(int(p["limit"]))
    return out


@register_post_op("distinct")
def _distinct(df: DataFrame, p: dict) -> DataFrame:
    subset = p.get("subset")
    return df.dropDuplicates(subset=list(subset)) if subset else df.distinct()


@register_post_op("linear_fit")
def _linear_fit(df: DataFrame, p: dict) -> DataFrame:
    from .experiment import linear_fit

    return linear_fit(
        df, p["x_col"], p["y_col"],
        group_cols=p.get("group_cols"),
        x_scale=p.get("x_scale", 100),
        y_scale=p.get("y_scale", 100),
        round_digits=p.get("round_digits", 10),
    )


@register_post_op("linear_fit_multi")
def _linear_fit_multi(df: DataFrame, p: dict) -> DataFrame:
    from .experiment import linear_fit_multi

    return linear_fit_multi(
        df, p["feature_cols"], p["label_col"],
        group_cols=p.get("group_cols"), ridge=p.get("ridge", 0.0),
    )


@register_post_op("corpus_report")
def _corpus_report(df: DataFrame, p: dict) -> DataFrame:
    from .corpus import corpus_report

    return corpus_report(
        df,
        text_col=p.get("text_col", "text"),
        lang_col=p.get("lang_col", "lang"),
        chars_col=p.get("chars_col", "n_chars"),
        short_chars=p.get("short_chars", 100),
        round_digits=p.get("round_digits", 6),
    )


@register_post_op("union")
def _union(df: DataFrame, p: dict) -> DataFrame:
    # declarative multi-source concatenation: the other side resolves
    # through the engine catalog like "join" (side=target unions an
    # upstream map's output); by-name with allowMissingColumns so
    # heterogeneous sources union on the shared schema
    resolve = p.get("_resolve")
    if resolve is None:
        raise SpecError(
            f"{p.get('_where', 'post_ops')}: 'union' needs the engine's "
            "catalog resolver (run the spec through DBT)"
        )
    other = resolve(p.get("side", "original"), p["table"])
    if p.get("filter"):
        other = other.filter(F.expr(p["filter"]))
    if p.get("select"):
        other = other.selectExpr(*p["select"])
    if p.get("by_name", True):
        return df.unionByName(
            other, allowMissingColumns=bool(p.get("allow_missing", False))
        )
    return df.unionAll(other)


@register_post_op("pivot")
def _pivot(df: DataFrame, p: dict) -> DataFrame:
    from .rollup import pivot_table

    return pivot_table(
        df, p["group_cols"], p["pivot_col"], p["values"],
        agg=p.get("agg", "count"), value_col=p.get("value_col"),
        fill=p.get("fill", 0),
    )


@register_post_op("unpivot")
def _unpivot(df: DataFrame, p: dict) -> DataFrame:
    from .rollup import unpivot_table

    return unpivot_table(
        df, p["id_cols"], p["value_cols"],
        var_name=p.get("var_name", "metric"),
        value_name=p.get("value_name", "value"),
    )


@register_post_op("strip_spans")
def _strip_spans(df: DataFrame, p: dict) -> DataFrame:
    # span-level exact-dup excision (one surviving copy corpus-wide);
    # see operators/dedup.py:strip_repeated_passages for the plan shape
    from .dedup import strip_repeated_passages

    return strip_repeated_passages(
        df,
        p.get("id_col", "doc_id"),
        p.get("text_col", "text"),
        span_words=p.get("span_words", 8),
        min_docs=p.get("min_docs", 2),
    )


@register_post_op("pca")
def _pca(df: DataFrame, p: dict) -> DataFrame:
    # closed-form PCA projection appended as an array<double> column;
    # see operators/similarity.py:pca_project for the plan shape
    from .similarity import pca_project

    return pca_project(
        df,
        id_col=p.get("id_col", "vec_id"),
        vec_col=p.get("vec_col", "embedding"),
        k=p.get("k", 8),
        scale=p.get("scale", 10**6),
        out_col=p.get("out_col", "pca"),
    )


@register_post_op("kmv_distinct")
def _kmv_distinct(df: DataFrame, p: dict) -> DataFrame:
    # bottom-k distinct sketch + estimate per group; see
    # operators/sketches.py:kmv_sketch for the bucketed-sort plan shape
    from .sketches import kmv_distinct, kmv_sketch

    k = p.get("k", 512)
    sk = kmv_sketch(df, p["keys"], p["value_col"], k=k,
                    fanout=p.get("fanout", 64))
    return kmv_distinct(sk, k=k).drop("kmv")


@register_post_op("hist_quantiles")
def _hist_quantiles(df: DataFrame, p: dict) -> DataFrame:
    # mergeable fixed-bin histogram per group + quantile read-off; see
    # operators/sketches.py:hist_measure / hist_quantiles
    from .sketches import hist_quantiles, hist_table

    lo, hi = float(p["lo"]), float(p["hi"])
    bins = p.get("bins", 64)
    log = p.get("log", False)
    # two-level leaf plan: bin once per row, count, assemble — see
    # hist_table's docstring for the measured gap vs the measure leaf
    h = hist_table(df, list(p["keys"]), p["value_col"], lo, hi,
                   bins=bins, log=log, out_col="hist")
    out = hist_quantiles(h, "hist", p.get("qs", [0.5]), lo, hi,
                         bins=bins, log=log)
    return out if p.get("keep_hist", False) else out.drop("hist")


@register_post_op("approx_agg")
def _approx_agg(df: DataFrame, p: dict) -> DataFrame:
    # sampled group aggregates with HT scaling + CLT error bars; see
    # operators/sketches.py:approx_agg
    from .sketches import approx_agg

    measures = {
        name: (spec[0], spec[1] if len(spec) > 1 else None)
        for name, spec in p["measures"].items()
    }
    return approx_agg(df, p["keys"], measures, fraction=p["fraction"],
                      seed=p.get("seed", 42), sigmas=p.get("sigmas", 4.0))


@register_post_op("image_dups")
def _image_dups(df: DataFrame, p: dict) -> DataFrame:
    # perceptual dHash near-dup pairs; see operators/media_dedup.py
    from .media_dedup import image_dup_pairs

    return image_dup_pairs(
        df,
        id_col=p.get("id_col", "doc_id"),
        content_col=p.get("content_col", "content"),
        hash_size=p.get("hash_size", 8),
        max_hamming=p.get("max_hamming", 6),
        errors=p.get("errors", "raise"),
    )


@register_post_op("audio_dups")
def _audio_dups(df: DataFrame, p: dict) -> DataFrame:
    # spectral-contrast fingerprint near-dup pairs; see
    # operators/media_dedup.py:audio_dup_pairs
    from .media_dedup import audio_dup_pairs

    return audio_dup_pairs(
        df,
        id_col=p.get("id_col", "doc_id"),
        content_col=p.get("content_col", "content"),
        max_hamming=p.get("max_hamming", 6),
        errors=p.get("errors", "raise"),
    )


@register_post_op("shortest_paths")
def _shortest_paths(df: DataFrame, p: dict) -> DataFrame:
    # frontier BFS distances to a landmark set; see operators/graph.py
    from .graph import shortest_paths

    return shortest_paths(
        df,
        landmarks=p["landmarks"],
        src=p.get("src", "src"),
        dst=p.get("dst", "dst"),
        directed=p.get("directed", True),
        max_iterations=p.get("max_iterations", 20),
    )


@register_post_op("label_propagation")
def _label_propagation(df: DataFrame, p: dict) -> DataFrame:
    # deterministic synchronous LPA communities; see operators/graph.py
    from .graph import label_propagation

    return label_propagation(
        df,
        src=p.get("src", "src"),
        dst=p.get("dst", "dst"),
        iterations=p.get("iterations", 5),
    )


@register_post_op("edit_join")
def _edit_join(df: DataFrame, p: dict) -> DataFrame:
    # exact-threshold Levenshtein linkage against another table (or the
    # frame itself when "table" is omitted); see operators/fuzzy.py
    from .fuzzy import edit_distance_join

    if "table" in p:
        resolve = p["_resolve"]
        if resolve is None:
            raise SpecError(
                f"{p['_where']}: edit_join with 'table' needs the engine "
                f"catalog resolver"
            )
        right = resolve(p.get("side", "original"), p["table"])
    else:
        right = df
    return edit_distance_join(
        df, right,
        p["id_col"], p["text_col"],
        p.get("right_id", p["id_col"]), p.get("right_col", p["text_col"]),
        max_distance=p.get("max_distance", 2),
        n=p.get("n", 3),
        max_df=p.get("max_df"),
    )


@register_post_op("weighted_paths")
def _weighted_paths(df: DataFrame, p: dict) -> DataFrame:
    # hop-bounded Bellman-Ford cheapest paths; see operators/graph.py
    from .graph import weighted_paths

    return weighted_paths(
        df,
        landmarks=p["landmarks"],
        src=p.get("src", "src"),
        dst=p.get("dst", "dst"),
        weight=p.get("weight", "weight"),
        directed=p.get("directed", True),
        hops=p.get("hops", 10),
    )


@register_post_op("seasonal_decompose")
def _seasonal_decompose(df: DataFrame, p: dict) -> DataFrame:
    # additive trend/seasonal/residual per key; see operators/temporal.py
    from .temporal import seasonal_decompose

    return seasonal_decompose(
        df, p.get("keys", []), p["ts_col"], p["value_col"],
        period=p["period"],
    )


@register_post_op("kaplan_meier")
def _kaplan_meier(df: DataFrame, p: dict) -> DataFrame:
    # KM survival curve per group; see operators/experiment.py
    from .experiment import kaplan_meier

    return kaplan_meier(
        df, p["duration_col"], p["event_col"],
        group_cols=p.get("group_cols"),
    )


@register_post_op("quantile_bin")
def _quantile_bin(df: DataFrame, p: dict) -> DataFrame:
    # exact-threshold quantile bucketing; see operators/corpus.py
    from .corpus import quantile_bin

    return quantile_bin(
        df, p["value_col"], p["n_buckets"],
        group_cols=p.get("group_cols"),
        out_col=p.get("out_col", "bucket"),
    )


@register_post_op("vocab_coverage")
def _vocab_coverage(df: DataFrame, p: dict) -> DataFrame:
    # per-doc OOV readout vs a vocabulary table resolved through the
    # engine catalog; see operators/text.py
    from .text import vocab_coverage

    resolve = p["_resolve"]
    if resolve is None:
        raise SpecError(
            f"{p['_where']}: vocab_coverage needs the engine catalog "
            f"resolver for its vocab table"
        )
    vocab = resolve(p.get("side", "original"), p["vocab_table"])
    return vocab_coverage(
        df, vocab,
        text_col=p.get("text_col", "text"),
        id_col=p.get("id_col", "doc_id"),
        token_col=p.get("token_col", "token"),
    )


@register_post_op("asof_refer_forward")
def _asof_forward_stage(df: DataFrame, p: dict) -> DataFrame:
    # forward as-of attach against another table; see
    # operators/temporal.py:asof_join_forward
    from .temporal import asof_join_forward

    resolve = p["_resolve"]
    if resolve is None:
        raise SpecError(
            f"{p['_where']}: asof_refer_forward needs the engine catalog "
            f"resolver"
        )
    right = resolve(p.get("side", "original"), p["table"])
    if "select" in p:
        right = right.selectExpr(*p["select"])
    return asof_join_forward(
        df, right, p["on"], p["left_ts"],
        right_ts=p.get("right_ts"),
        tolerance=p.get("tolerance"),
        suffix=p.get("suffix", "_right"),
    )


@register_post_op("hybrid_retrieve")
def _hybrid_retrieve(df: DataFrame, p: dict) -> DataFrame:
    """Declarative hybrid retrieval (VERDICT r10 #3): the input frame is
    the QUERY set (``query_id_col`` + ``query_col`` text); the stage
    retrieves top-``k`` per query LEXICALLY (BM25 over
    ``corpus_table``, or a prebuilt :func:`bm25_index` posting table via
    ``index_table=`` — add ``stats_table=`` for the stats-served 100 TB
    path) and SEMANTICALLY (cosine over ``embeddings_table``; exact
    ``semantic: "brute"`` or IVF-bucketed ``"ivf"``), then fuses by
    weighted reciprocal rank (:func:`~.similarity.rrf_fuse`).  Output:
    ``(query_id_col, neighbor_id, rrf_score, rank)`` — the flagship
    "gate → index → hybrid retrieve" pipeline is now expressible in one
    spec instead of hand-written Python around ``rrf_fuse``.

    Probe vectors come from ``query_vec_col`` when the frame already
    carries embeddings, else by joining the query ids against
    ``embeddings_table`` (query-sized semi-join — the corpus never
    fans out).  ``exclude_self: true`` drops a query's own document
    from its lexical list AFTER the rank cut (matching the seed-
    expansion convention where queries are corpus members; the
    semantic legs always self-exclude).

    Scale shape: both legs are the audited retrieval operators (posting-
    bounded BM25, broadcast-probe or IVF-bucketed cosine); fusion is one
    union + one (query, id) agg over lists of ``k`` rows per query.
    """
    from .similarity import cosine_topk, ivf_topk, rrf_fuse
    from .text import (
        bm25_index_stats, bm25_topk, bm25_topk_indexed,
    )

    resolve = p.get("_resolve")
    if resolve is None:
        raise SpecError(
            f"{p.get('_where', 'post_ops')}: 'hybrid_retrieve' needs the "
            "engine's catalog resolver — run the spec through DBT (or "
            "pass resolve= to apply_post_ops)"
        )
    if ("corpus_table" in p) == ("index_table" in p):
        raise SpecError(
            f"{p.get('_where', 'post_ops')}: 'hybrid_retrieve' takes "
            "exactly one lexical source — corpus_table (direct BM25) or "
            "index_table (a bm25_index posting table)"
        )
    side = p.get("side", "original")
    qid = p.get("query_id_col", "query_id")
    qtext = p.get("query_col", "query")
    k = p.get("k", 10)
    kw = dict(k1=p.get("k1", 1.2), b=p.get("b", 0.75), k=k,
              max_df_ratio=p.get("max_df_ratio"))
    queries = df.select(F.col(qid).alias("query_id"),
                        F.col(qtext).alias("query"))
    if "index_table" in p:
        idx = resolve(side, p["index_table"])
        stats = (
            resolve(side, p["stats_table"]) if p.get("stats_table")
            else bm25_index_stats(idx)
        )
        lex = bm25_topk_indexed(
            idx, queries, id_col=p.get("id_col", "doc_id"),
            stats=stats, allow_stale=p.get("allow_stale", False), **kw)
    else:
        lex = bm25_topk(
            resolve(side, p["corpus_table"]), queries,
            id_col=p.get("id_col", "doc_id"),
            text_col=p.get("text_col", "text"), **kw)
    lex = lex.select(
        "query_id",
        F.col(p.get("id_col", "doc_id")).alias("neighbor_id"),
        "rank",
    )
    if p.get("exclude_self", False):
        lex = lex.filter(F.col("neighbor_id") != F.col("query_id"))

    emb = resolve(side, p["embeddings_table"])
    vid = p.get("vec_id_col", "vec_id")
    vec = p.get("vec_col", "embedding")
    qvec = p.get("query_vec_col")
    if qvec is not None:
        probes = df.select(F.col(qid).alias(vid), F.col(qvec).alias(vec))
    else:
        probes = emb.join(
            F.broadcast(df.select(F.col(qid).alias("__qid"))),
            F.col(vid) == F.col("__qid"), "leftsemi")
    if p.get("semantic", "brute") == "ivf":
        sem = ivf_topk(
            emb, probes, vid, vec, k=k,
            nprobe=p.get("nprobe", 3),
            method=p.get("centroid_method", "stride"),
            n_centroids=p.get("n_centroids", 64))
    else:
        sem = cosine_topk(emb, probes, vid, vec, k=k)
    sem = sem.select("query_id", "neighbor_id", "rank")

    fused = rrf_fuse(
        [lex, sem], k=p.get("rrf_k", 60), topk=p.get("topk", 10),
        weights=p.get("weights"))
    return fused.select(
        F.col("query_id").alias(qid), "neighbor_id", "rrf_score",
        F.col("rank").cast("long").alias("rank"))


# Every stage registered above is a built-in: all take the engine context
# keys (at minimum ``_where`` for error provenance).  Snapshot them into
# the context set HERE, after the last built-in decorator has run — user
# registrations happen post-import and stay context-free unless they pass
# ``register_post_op(name, context=True)``.
_CONTEXT_OPS.update(POST_OPS)
