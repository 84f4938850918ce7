"""Pass 3 — three-stage entity linking.

Web retarget of GitNexus's 3-stage call resolution
(reference src/core/ingestion/call-processor.ts:146-300):

  stage 1  exact alias-dictionary match  (ImportMap lookup,
           call-processor.ts:167-217)        -> broadcast hash join
  stage 2  same-document exact match        (file-index lookup,
           call-processor.ts:222-235, trie.ts:119-123) -> equi-join (doc,name)
  stage 2b global exact-name match          (trie name index, trie.ts:89-92)
  stage 3  fuzzy candidate blocking + scored top-1
           (findEndingWith + path-distance scoring,
           call-processor.ts:240-300, trie.ts:182-208)
           -> character-3-gram blocking join + Jaccard scoring +
              Window row_number()==1 (W1 in SURVEY §2.5); the blocking is
              the set-similarity-join analogue of MinHash-LSH banding

Determinism: the reference picks ``candidates[0]`` (array order —
nondeterministic under parallelism); we impose a total order
(score DESC, canonical name ASC) in the top-1 window.

Skew: head entities make both the gram-blocking join and the exact-name
join skewed. Mitigations: (a) grams with document frequency above
``max_gram_df`` are dropped from blocking (prefix-filter standard
practice), (b) AQE skew-join is on session-wide, (c) the registry side is
deduped to one row per name before joining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.ids import node_id

CONF_EXACT_ALIAS = 1.0     # ref call-processor.ts stage-1 "exact"
CONF_SAME_DOC = 0.95
CONF_GLOBAL_EXACT = 0.9
CONF_FUZZY = 0.6


def entity_registry(mentions_df: DataFrame) -> DataFrame:
    """Distinct mention surface forms -> entity dimension.

    (entity_id, name, n_docs, first_doc) — the FunctionRegistryTrie
    analogue (reference src/core/graph/trie.ts:17-33). first_doc uses a
    deterministic min, never "first seen" (which is partition-order
    dependent).

    Skew note: head entities put most mention rows on a handful of names,
    so a direct groupBy(name).countDistinct(url) funnels them into a few
    reducers. Decomposed instead as dropDuplicates(name, url) — partial
    (map-side) dedup on well-distributed composite keys — followed by a
    plain count per name. Same result, no hot reducer.
    """
    pairs = mentions_df.select("name", "url").dropDuplicates(["name", "url"])
    return (
        pairs.groupBy("name")
        .agg(F.count("url").alias("n_docs"), F.min("url").alias("first_doc"))
        .select(node_id("Entity", F.col("name")).alias("entity_id"),
                "name", "n_docs", "first_doc")
    )


def link_mentions(
    unresolved: DataFrame,
    registry: DataFrame,
    alias_dict: DataFrame | None = None,
    fuzzy_threshold: float = 0.5,
    max_gram_df: int = 10_000,
    ngram: int = 3,
) -> DataFrame:
    """Resolve raw surface forms to canonical entities in three stages.

    unresolved: (doc_url, name, role) — triple endpoints to resolve.
    registry:   entity_registry() output (the canonical side).
    alias_dict: (alias, canonical_name), small, broadcast (stage 1).

    Returns (doc_url, name, role, canonical_name, entity_id, stage, confidence)
    with exactly one row per input row (unresolved rows keep
    canonical_name = NULL, stage = 'failed' — the reference's failure
    categorization, call-processor.ts:857-870).
    """
    reg_names = registry.select("name").dropDuplicates(["name"])
    # same-doc index: (doc, name) pairs where the doc itself mentions the name
    # is supplied by caller via `unresolved` having come from mentions; here we
    # approximate the file-index with registry.first_doc only when needed.

    m = unresolved.select("doc_url", "name", "role").withColumn(
        "_mid", F.monotonically_increasing_id()
    )

    # ---- stage 1: broadcast alias-dictionary join --------------------------
    if alias_dict is not None:
        ad = alias_dict.select(F.col("alias").alias("_alias"),
                               F.col("canonical_name").alias("c1"))
        s1 = (
            m.join(F.broadcast(ad), m.name == F.col("_alias"), "left")
            .select("_mid", "doc_url", "name", "role", "c1")
        )
    else:
        s1 = m.select("_mid", "doc_url", "name", "role",
                      F.lit(None).cast("string").alias("c1"))

    # ---- stage 2: exact name match against the registry --------------------
    s2 = (
        s1.join(reg_names.withColumnRenamed("name", "c2"),
                s1.name == F.col("c2"), "left")
    )

    resolved_exact = s2.select(
        "_mid", "doc_url", "name", "role",
        F.coalesce("c1", "c2").alias("canonical_name"),
        F.when(F.col("c1").isNotNull(), F.lit("alias_exact"))
         .when(F.col("c2").isNotNull(), F.lit("name_exact"))
         .otherwise(F.lit(None)).alias("stage"),
        F.when(F.col("c1").isNotNull(), F.lit(CONF_EXACT_ALIAS))
         .when(F.col("c2").isNotNull(), F.lit(CONF_GLOBAL_EXACT))
         .otherwise(F.lit(None)).alias("confidence"),
    ).localCheckpoint()  # vocab-scale; evaluated once, reused by the
    #                      isEmpty probe AND both result branches below

    still = resolved_exact.filter(F.col("canonical_name").isNull()) \
                          .select("_mid", "doc_url", "name", "role")

    # short-circuit: when stages 1+2 resolved everything, skip building the
    # (multi-stage) fuzzy plan entirely — common on clean corpora, and the
    # empty-probe plan still costs several shuffle rounds of fixed overhead.
    if still.isEmpty():
        return resolved_exact.select(
            "doc_url", "name", "role", "canonical_name",
            F.when(F.col("canonical_name").isNotNull(),
                   node_id("Entity", F.col("canonical_name"))).alias("entity_id"),
            F.coalesce("stage", F.lit("failed")).alias("stage"), "confidence",
        )

    # ---- stage 3: n-gram Jaccard blocking join -----------------------------
    def gram_explode(df: DataFrame, name_col: str, id_cols: list[str]) -> DataFrame:
        g = df.select(
            *id_cols,
            F.expr(
                f"array_distinct(transform(sequence(1, greatest(length({name_col}) - {ngram - 1}, 1)),"
                f" i -> substring(lower({name_col}), i, {ngram})))"
            ).alias("grams"),
        )
        return g.select(*id_cols, F.size("grams").alias("n_grams"),
                        F.explode("grams").alias("gram"))

    probe = gram_explode(still.dropDuplicates(["name"]), "name", ["name"])
    build = gram_explode(reg_names, "name", ["name"]) \
        .withColumnRenamed("name", "cand") \
        .withColumnRenamed("n_grams", "cand_grams")

    # prefix-filter: drop ultra-common grams (head-entity skew guard)
    gram_df = build.groupBy("gram").count().filter(F.col("count") <= max_gram_df)
    build = build.join(gram_df.select("gram"), "gram")

    overlaps = (
        probe.join(build, "gram")
        .groupBy("name", "cand", "n_grams", "cand_grams")
        .agg(F.count("*").alias("common"))
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_grams") + F.col("cand_grams") - F.col("common")),
        )
        .filter(F.col("jaccard") >= fuzzy_threshold)
        .filter(F.col("name") != F.col("cand"))
    )
    w = Window.partitionBy("name").orderBy(F.desc("jaccard"), F.asc("cand"))
    best = (
        overlaps.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("name", F.col("cand").alias("c3"), F.col("jaccard").alias("fuzzy_score"))
    )

    s3 = still.join(best, "name", "left").select(
        "_mid", "doc_url", "name", "role",
        F.col("c3").alias("canonical_name"),
        F.when(F.col("c3").isNotNull(), F.lit("fuzzy")).otherwise(F.lit("failed")).alias("stage"),
        F.when(F.col("c3").isNotNull(), F.lit(CONF_FUZZY)).otherwise(F.lit(None)).alias("confidence"),
    )

    out = resolved_exact.filter(F.col("canonical_name").isNotNull()).unionByName(s3)
    return out.select(
        "doc_url", "name", "role", "canonical_name",
        F.when(F.col("canonical_name").isNotNull(),
               node_id("Entity", F.col("canonical_name"))).alias("entity_id"),
        "stage", "confidence",
    )


def link_triples(
    triples_df: DataFrame,
    registry: DataFrame,
    alias_dict: DataFrame | None = None,
    **kw,
) -> DataFrame:
    """Resolve subj and obj of raw triples; returns canonicalized triples.

    (doc_url, subj, pred, obj, subj_stage, obj_stage, confidence) where
    subj/obj are canonical names. Unresolvable endpoints keep the raw
    surface form (stage='failed'), mirroring the reference's behavior of
    keeping unresolved calls out of the CALLS edge set but counting them
    (call-processor.ts:93-119).
    """
    subj = triples_df.select(F.col("doc_url"), F.col("subj").alias("name")) \
                     .withColumn("role", F.lit("subj"))
    obj = triples_df.select(F.col("doc_url"), F.col("obj").alias("name")) \
                    .withColumn("role", F.lit("obj"))
    endpoints = subj.unionByName(obj).dropDuplicates(["doc_url", "name", "role"])

    linked = link_mentions(endpoints, registry, alias_dict, **kw)

    ls = linked.filter(F.col("role") == "subj").select(
        "doc_url", F.col("name").alias("subj"),
        F.col("canonical_name").alias("subj_canon"),
        F.col("stage").alias("subj_stage"),
        F.col("confidence").alias("subj_conf"),
    )
    lo = linked.filter(F.col("role") == "obj").select(
        "doc_url", F.col("name").alias("obj"),
        F.col("canonical_name").alias("obj_canon"),
        F.col("stage").alias("obj_stage"),
        F.col("confidence").alias("obj_conf"),
    )
    return (
        triples_df.join(ls, ["doc_url", "subj"], "left")
        .join(lo, ["doc_url", "obj"], "left")
        .select(
            "doc_url", "pred",
            F.coalesce("subj_canon", "subj").alias("subj"),
            F.coalesce("obj_canon", "obj").alias("obj"),
            "subj_stage", "obj_stage",
            (F.coalesce("subj_conf", F.lit(0.0)) * F.coalesce("obj_conf", F.lit(0.0)))
                .alias("confidence"),
        )
    )
