"""Pass 3 — four-stage entity linking.

Web retarget of GitNexus's staged call resolution
(reference src/core/ingestion/call-processor.ts:146-300):

  stage 1  exact alias-dictionary match  (ImportMap lookup,
           call-processor.ts:167-217)        -> broadcast hash join
  stage 2  same-document definition match   (file-index lookup,
           call-processor.ts:222-235, trie.ts:119-123) -> the samedoc flag
           is computed SCAN-LOCAL during extraction (the doc's definition
           set is in hand there), so this stage costs zero joins
  stage 2b global exact-name match          (trie name index, trie.ts:89-92)
  stage 3  fuzzy candidate blocking + scored top-1
           (findEndingWith + import-distance scoring,
           call-processor.ts:240-300, trie.ts:182-208)
           -> character-3-gram blocking join + Jaccard scoring +
              URL-locality tiebreak (host/path prefix distance — the web
              analogue of calculateImportDistance's same-file and
              sibling-directory bonuses) + top-1 window (W1, SURVEY §2.5)

Determinism: the reference picks ``candidates[0]`` (array order —
nondeterministic under parallelism); we impose a total order
(score DESC, url-distance ASC, canonical name ASC) in the top-1 window.

Scale shape: everything name-keyed (alias, global exact, fuzzy) runs on
the DISTINCT-NAME dimension (vocabulary-scale) and joins back onto the
fact table — broadcast when the MEASURED vocabulary size fits the gate
(plans.hints, VERDICT r03 #1), name-keyed shuffle join when it doesn't;
the only doc-granular signal (same-doc match) rides on the rows
themselves as a boolean set during extraction. In the broadcast regime
there is no fact-table shuffle anywhere in linking.

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
from ..functions.urls import url_distance_expr

CONF_EXACT_ALIAS = 1.0     # ref call-processor.ts stage-1 "exact"
CONF_SAME_DOC = 0.95       # ref stageSameFileMatch, call-processor.ts:222
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


def fuzzy_candidates(
    probe_names: DataFrame,
    registry: DataFrame,
    fuzzy_threshold: float = 0.5,
    max_gram_df: int = 10_000,
    ngram: int = 3,
    locality_col: str | None = None,
) -> DataFrame:
    """Stage-3 fuzzy matching: n-gram Jaccard blocking + scored top-1.

    probe_names: (name[, locality_col]) distinct unresolved surface forms;
    when ``locality_col`` is given (a URL, e.g. the mention's page), ties
    in Jaccard break on url_distance(locality, candidate.first_doc) ASC —
    the web analogue of the reference's import-distance bonuses
    (trie.ts:182-208: same-file > sibling-directory > farther).
    Returns one best candidate per probe row: (name[, locality], c_fuzzy,
    fuzzy_score).
    """
    keys = ["name"] + ([locality_col] if locality_col else [])
    probe_src = probe_names.select(*keys).dropDuplicates(keys)

    def gram_explode(df: DataFrame, id_cols: list[str]) -> DataFrame:
        g = df.select(
            *id_cols,
            F.expr(
                f"array_distinct(transform(sequence(1, greatest(length(name) - {ngram - 1}, 1)),"
                f" i -> substring(lower(name), i, {ngram})))"
            ).alias("grams"),
        )
        return g.select(*id_cols, F.size("grams").alias("n_grams"),
                        F.explode("grams").alias("gram"))

    probe = gram_explode(probe_src, keys)
    build = gram_explode(
        registry.select("name", "first_doc").withColumnRenamed("name", "cand")
                .withColumnRenamed("first_doc", "cand_doc")
                .withColumn("name", F.col("cand")),
        ["cand", "cand_doc"],
    )

    # prefix-filter: drop ultra-common grams (head-entity skew guard)
    gram_df = build.groupBy("gram").count().filter(F.col("count") <= max_gram_df)
    build = build.join(gram_df.select("gram"), "gram") \
                 .withColumnRenamed("n_grams", "cand_grams")

    overlaps = (
        probe.join(build, "gram")
        .groupBy(*keys, "cand", "cand_doc", "n_grams", "cand_grams")
        .agg(F.count("*").alias("common"))
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_grams") + F.col("cand_grams") - F.col("common")),
        )
        .filter(F.col("jaccard") >= fuzzy_threshold)
        .filter(F.col("name") != F.col("cand"))
    )
    if locality_col:
        overlaps = overlaps.withColumn(
            "url_dist", url_distance_expr(F.col(locality_col), F.col("cand_doc")))
        order = [F.desc("jaccard"), F.asc("url_dist"), F.asc("cand")]
    else:
        order = [F.desc("jaccard"), F.asc("cand")]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        overlaps.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(*keys, F.col("cand").alias("c_fuzzy"),
                F.col("jaccard").alias("fuzzy_score"))
    )


def fuzzy_candidates_all(
    probe_names: DataFrame,
    registry: DataFrame,
    fuzzy_threshold: float = 0.5,
    max_gram_df: int = 10_000,
    ngram: int = 3,
    top_per_name: int = 8,
) -> DataFrame:
    """All above-threshold fuzzy candidates per probe NAME, capped at
    ``top_per_name`` by (jaccard DESC, cand ASC).

    This is the vocabulary-scale half of per-call-site fuzzy resolution
    (reference scores candidates per call with import distance,
    call-processor.ts:240-323): the expensive gram-blocking join runs ONCE
    per distinct unresolved name, and the resulting small candidate table
    is re-ranked per site by ``site_fuzzy_map`` — the site dimension never
    touches the blocking join. Returns (name, cand, cand_doc, jaccard).
    """
    probe_src = probe_names.select("name").dropDuplicates(["name"])

    def gram_explode(df: DataFrame, id_cols: list[str]) -> DataFrame:
        g = df.select(
            *id_cols,
            F.expr(
                f"array_distinct(transform(sequence(1, greatest(length(name) - {ngram - 1}, 1)),"
                f" i -> substring(lower(name), i, {ngram})))"
            ).alias("grams"),
        )
        return g.select(*id_cols, F.size("grams").alias("n_grams"),
                        F.explode("grams").alias("gram"))

    probe = gram_explode(probe_src, ["name"])
    build = gram_explode(
        registry.select("name", "first_doc").withColumnRenamed("name", "cand")
                .withColumnRenamed("first_doc", "cand_doc")
                .withColumn("name", F.col("cand")),
        ["cand", "cand_doc"],
    )
    gram_df = build.groupBy("gram").count().filter(F.col("count") <= max_gram_df)
    build = build.join(gram_df.select("gram"), "gram") \
                 .withColumnRenamed("n_grams", "cand_grams")

    overlaps = (
        probe.join(build, "gram")
        .groupBy("name", "cand", "cand_doc", "n_grams", "cand_grams")
        .agg(F.count("*").alias("common"))
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_grams") + F.col("cand_grams") - F.col("common")),
        )
        .filter(F.col("jaccard") >= fuzzy_threshold)
        .filter(F.col("name") != F.col("cand"))
    )
    w = Window.partitionBy("name").orderBy(F.desc("jaccard"), F.asc("cand"))
    return (
        overlaps.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_per_name)
        .select("name", "cand", "cand_doc", "jaccard")
    )


def site_fuzzy_map(
    pairs: DataFrame,
    candidates: DataFrame,
    locality_col: str = "doc_url",
) -> DataFrame:
    """Per-call-site fuzzy winner: re-rank a name's candidates with the
    site's URL locality (reference scores every candidate per call site,
    call-processor.ts:305-323 / trie.ts:182-208).

    pairs: (locality, name) distinct call sites of unresolved names;
    candidates: fuzzy_candidates_all() output (vocabulary-scale). The
    join is deliberately UNHINTED here: the size-aware caller decides —
    KGPipeline wraps candidates in a gated broadcast when the observed
    vocabulary fits (plans.hints), and AQE picks for everyone else; a
    forced hint at 1e8+ unresolved names would be an OOM (VERDICT r03
    #1). Ranking: jaccard DESC, url_distance(locality, cand_doc) ASC,
    cand ASC. Returns (locality, name, c_fuzzy, fuzzy_score) — one row
    per input pair that has at least one candidate. The top-1 window
    partitions on (locality, name), the pair key itself — evenly
    distributed, no hot reducer.
    """
    p = pairs.select(locality_col, "name").dropDuplicates([locality_col, "name"])
    j = (
        p.join(candidates, "name")
        .withColumn("url_dist",
                    url_distance_expr(F.col(locality_col), F.col("cand_doc")))
    )
    w = Window.partitionBy(locality_col, "name").orderBy(
        F.desc("jaccard"), F.asc("url_dist"), F.asc("cand"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(locality_col, "name", F.col("cand").alias("c_fuzzy"),
                F.col("jaccard").alias("fuzzy_score"))
    )


def exact_resolution_map(
    names: DataFrame,
    registry: DataFrame,
    alias_dict: DataFrame | None = None,
) -> DataFrame:
    """Stages 1+2b only: (name, c_alias, c_exact), checkpointed (it
    anchors both the fuzzy probe set and the final map)."""
    n = names.select("name").dropDuplicates(["name"])
    if alias_dict is not None:
        ad = alias_dict.select(F.col("alias").alias("_alias"),
                               F.col("canonical_name").alias("c_alias"))
        m = n.join(F.broadcast(ad), n.name == F.col("_alias"), "left") \
             .select("name", "c_alias")
    else:
        m = n.select("name", F.lit(None).cast("string").alias("c_alias"))

    reg_names = registry.select(F.col("name").alias("c_exact")) \
                        .dropDuplicates(["c_exact"])
    return m.join(reg_names, m.name == F.col("c_exact"), "left") \
            .select("name", "c_alias", "c_exact").localCheckpoint()


def fuzzy_top1(candidates: DataFrame) -> DataFrame:
    """Global (locality-free) fuzzy winner per name from a candidate
    table: (name, c_fuzzy, fuzzy_score). Order matches
    fuzzy_candidates_all's cap (jaccard DESC, cand ASC), so top-1 of the
    capped list IS the global top-1."""
    w = Window.partitionBy("name").orderBy(F.desc("jaccard"), F.asc("cand"))
    return (candidates.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("name", F.col("cand").alias("c_fuzzy"),
                    F.col("jaccard").alias("fuzzy_score")))


def name_resolution_map(
    names: DataFrame,
    registry: DataFrame,
    alias_dict: DataFrame | None = None,
    fuzzy_threshold: float = 0.5,
    max_gram_df: int = 10_000,
    ngram: int = 3,
) -> DataFrame:
    """The name-keyed half of linking: (name, c_alias, c_exact, c_fuzzy).

    All three columns are candidate canonical names (NULL = that stage
    found nothing). Vocabulary-scale — computed once, broadcast back onto
    any fact table. Fuzzy is only attempted for names missing BOTH exact
    stages (the reference's stage ordering), and skipped entirely when
    nothing is left (isEmpty short-circuit: an empty fuzzy plan still
    costs several fixed shuffle rounds). KGPipeline uses the split
    pieces directly (exact_resolution_map + a committed
    fuzzy_candidates_all table + fuzzy_top1) so the expensive
    gram-blocking join runs ONCE per run and feeds both the global
    winner and the per-site re-rank; this composed form is the
    standalone-API path and matches it stage-for-stage.
    """
    m = exact_resolution_map(names, registry, alias_dict)
    still = m.filter(F.col("c_alias").isNull() & F.col("c_exact").isNull()) \
             .select("name")
    if still.isEmpty():
        return m.withColumn("c_fuzzy", F.lit(None).cast("string"))

    best = fuzzy_top1(fuzzy_candidates_all(
        still, registry, fuzzy_threshold, max_gram_df, ngram,
        top_per_name=1))
    return m.join(best.select("name", "c_fuzzy"), "name", "left")


def stage_columns(c_alias: F.Column, samedoc: F.Column, c_exact: F.Column,
                  c_fuzzy: F.Column, name: F.Column) -> tuple[F.Column, F.Column, F.Column]:
    """Shared stage-precedence logic -> (canonical_name, stage, confidence).

    Precedence mirrors the reference: alias/import map, then same-document
    definition, then global exact, then fuzzy, else failed."""
    canonical = (
        F.when(c_alias.isNotNull(), c_alias)
        .when(samedoc, name)
        .when(c_exact.isNotNull(), c_exact)
        .otherwise(c_fuzzy)
    )
    stage = (
        F.when(c_alias.isNotNull(), F.lit("alias_exact"))
        .when(samedoc, F.lit("same_doc"))
        .when(c_exact.isNotNull(), F.lit("name_exact"))
        .when(c_fuzzy.isNotNull(), F.lit("fuzzy"))
        .otherwise(F.lit("failed"))
    )
    confidence = (
        F.when(c_alias.isNotNull(), F.lit(CONF_EXACT_ALIAS))
        .when(samedoc, F.lit(CONF_SAME_DOC))
        .when(c_exact.isNotNull(), F.lit(CONF_GLOBAL_EXACT))
        .when(c_fuzzy.isNotNull(), F.lit(CONF_FUZZY))
        .otherwise(F.lit(None).cast("double"))
    )
    return canonical, stage, confidence


def link_mentions(
    unresolved: DataFrame,
    registry: DataFrame,
    alias_dict: DataFrame | None = None,
    fuzzy_threshold: float = 0.5,
    max_gram_df: int = 10_000,
    ngram: int = 3,
    samedoc_col: str | None = None,
    doc_definitions: DataFrame | None = None,
) -> DataFrame:
    """Resolve raw surface forms to canonical entities in four stages.

    unresolved: (doc_url, name, role[, samedoc]) — endpoints to resolve.
    registry:   entity_registry() output (the canonical side).
    alias_dict: (alias, canonical_name), small, broadcast (stage 1).
    samedoc_col: boolean column on `unresolved` marking endpoints whose
        name matches a definition in the SAME document (precomputed
        scan-local by extract_corpus — the zero-join path).
    doc_definitions: alternative same-doc signal as a (doc_url, name)
        index; left-joined on (doc_url, name) when samedoc_col is absent.
        At scale both sides should be co-partitioned by doc_url.

    Returns (doc_url, name, role, canonical_name, entity_id, stage,
    confidence) with exactly one row per input row (unresolved rows keep
    canonical_name = NULL, stage = 'failed' — the reference's failure
    categorization, call-processor.ts:857-870).
    """
    m = unresolved
    if samedoc_col is not None:
        m = m.withColumn("_samedoc", F.coalesce(F.col(samedoc_col), F.lit(False)))
    elif doc_definitions is not None:
        defs = doc_definitions.select("doc_url", "name") \
            .dropDuplicates(["doc_url", "name"]).withColumn("_samedoc", F.lit(True))
        m = m.join(defs, ["doc_url", "name"], "left") \
             .withColumn("_samedoc", F.coalesce("_samedoc", F.lit(False)))
    else:
        m = m.withColumn("_samedoc", F.lit(False))

    nmap = name_resolution_map(m.select("name"), registry, alias_dict,
                               fuzzy_threshold, max_gram_df, ngram)
    # Size-gate the map join (VERDICT r03 #1): materialize the
    # vocabulary-scale map once (it feeds the fact join anyway — the
    # checkpoint trades one small write for not recomputing the fuzzy
    # chain), then broadcast ONLY if the measured count fits; an
    # oversized vocabulary joins co-keyed on name instead of OOMing the
    # executors with a forced build side.
    from ..plans.hints import EST_ROW_BYTES, BROADCAST_MAX_BYTES, \
        broadcast_if_small
    nmap = nmap.localCheckpoint()
    nmap = broadcast_if_small(nmap, nmap.count() * EST_ROW_BYTES,
                              BROADCAST_MAX_BYTES)
    canonical, stage, confidence = stage_columns(
        F.col("c_alias"), F.col("_samedoc"), F.col("c_exact"),
        F.col("c_fuzzy"), F.col("name"))
    return (
        m.join(nmap, "name", "left")
        .select(
            "doc_url", "name", "role",
            canonical.alias("canonical_name"),
            F.when(canonical.isNotNull(),
                   node_id("Entity", canonical)).alias("entity_id"),
            stage.alias("stage"),
            confidence.alias("confidence"),
        )
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
    (call-processor.ts:93-119). Uses the samedoc flags when the input
    came from extract_corpus.
    """
    has_flags = "subj_samedoc" in triples_df.columns
    subj = triples_df.select(
        "doc_url", F.col("subj").alias("name"), F.lit("subj").alias("role"),
        (F.col("subj_samedoc") if has_flags else F.lit(False)).alias("samedoc"))
    obj = triples_df.select(
        "doc_url", F.col("obj").alias("name"), F.lit("obj").alias("role"),
        (F.col("obj_samedoc") if has_flags else F.lit(False)).alias("samedoc"))
    endpoints = subj.unionByName(obj).dropDuplicates(["doc_url", "name", "role"])

    linked = link_mentions(endpoints, registry, alias_dict,
                           samedoc_col="samedoc", **kw)

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
