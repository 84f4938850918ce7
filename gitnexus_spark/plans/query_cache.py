"""Query-result cache with similar-question reuse.

Reference: src/lib/query-cache.ts — addQuery + evictOldest under
maxCacheSize=1000 (:80-90), findSimilarQueries(minSimilarity=0.7,
maxResults=5, minConfidence=0.6) ranked by similarity * confidence
(:95-137), getBestQuery at the stricter (0.8, 0.7) bar (:140-156); the
similarity is the semantic-similarity.ts blend, which is implemented and
oracle-checked as functions/similarity_text.blended_similarity.

The reference caches Cypher strings in browser localStorage for a chat
UI. The batch-engine analogue caches MATERIALIZED RESULTS: each entry
is (question, query text, confidence, stats) in a flock-guarded JSON
manifest plus an optional parquet directory holding the result rows, so
a repeated or paraphrased analytical question re-reads a small committed
table instead of re-running the job. Similarity scoring runs as a tiny
Spark job over the manifest's questions (bounded by max_entries — a
dimension, never data-scale) using the exact blend the reference uses.
"""

from __future__ import annotations

import fcntl
import hashlib
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.similarity_text import blended_similarity

#: reference defaults (query-cache.ts)
MAX_ENTRIES = 1000          # :44 maxCacheSize
MIN_SIMILARITY = 0.7        # :104 findSimilarQueries
MIN_CONFIDENCE = 0.6        # :106
BEST_MIN_SIMILARITY = 0.8   # :143 getBestQuery
BEST_MIN_CONFIDENCE = 0.7   # :145


def _qhash(question: str) -> str:
    """Stable entry key: normalized-question hash (ref hashQuestion)."""
    norm = " ".join(question.lower().split())
    return hashlib.md5(norm.encode("utf-8")).hexdigest()


class QueryCache:
    """File-backed query cache; safe for concurrent drivers (manifest
    updates go through an exclusive flock, the same discipline as
    sources/snapshots.py commits)."""

    def __init__(self, spark: SparkSession, cache_dir: str,
                 max_entries: int = MAX_ENTRIES) -> None:
        self.spark = spark
        self.cache_dir = cache_dir
        self.max_entries = max_entries
        os.makedirs(cache_dir, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.cache_dir, "manifest.json")

    def _load(self) -> dict[str, dict]:
        try:
            with open(self._manifest_path) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return {}

    def _locked_update(self, fn) -> None:
        lock = os.path.join(self.cache_dir, ".lock")
        with open(lock, "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            entries = self._load()
            fn(entries)
            tmp = self._manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(entries, f, indent=1)
            os.replace(tmp, self._manifest_path)

    # -- write path --------------------------------------------------------
    def add(self, question: str, query: str, result: DataFrame | None = None,
            confidence: float = 1.0, execution_time: float = 0.0,
            success: bool = True) -> dict:
        """Cache a question -> query mapping, optionally materializing
        the result rows. Returns the manifest entry."""
        key = _qhash(question)
        result_path = None
        n_rows = -1
        if result is not None:
            result_path = os.path.join(self.cache_dir, key)
            result.write.mode("overwrite").parquet(result_path)
            n_rows = self.spark.read.parquet(result_path).count()
        entry = {
            "question": question, "query": query,
            "confidence": float(confidence),
            "execution_time": float(execution_time),
            "result_count": n_rows, "success": bool(success),
            "timestamp": time.time(),
            "result_path": result_path,
        }

        def _apply(entries: dict[str, dict]) -> None:
            entries[key] = entry
            while len(entries) > self.max_entries:  # ref evictOldest :85-87
                oldest = min(entries, key=lambda k: entries[k]["timestamp"])
                dropped = entries.pop(oldest)
                if dropped.get("result_path"):
                    shutil.rmtree(dropped["result_path"], ignore_errors=True)

        self._locked_update(_apply)
        return entry

    # -- read path ---------------------------------------------------------
    def find_similar(self, question: str,
                     min_similarity: float = MIN_SIMILARITY,
                     max_results: int = 5,
                     min_confidence: float = MIN_CONFIDENCE) -> list[dict]:
        """Suggestions ranked by similarity * confidence (ref :128-134).
        Scoring is one Spark job over the manifest's questions — a
        bounded dimension frame using the oracle-checked blend."""
        entries = [e for e in self._load().values()
                   if e["success"] and e["confidence"] >= min_confidence]
        if not entries:
            return []
        cached = self.spark.createDataFrame(
            [(e["question"],) for e in entries], "text_a string")
        scored = blended_similarity(
            cached.withColumn("text_b", F.lit(question)))
        sims = {r["text_a"]: r["similarity"] for r in
                scored.select("text_a", "similarity").collect()}
        out = []
        for e in entries:
            sim = sims.get(e["question"], 0.0)
            if sim >= min_similarity:
                out.append({**e, "similarity": sim})
        out.sort(key=lambda e: e["similarity"] * e["confidence"],
                 reverse=True)
        return out[:max_results]

    def best(self, question: str,
             min_similarity: float = BEST_MIN_SIMILARITY,
             min_confidence: float = BEST_MIN_CONFIDENCE) -> dict | None:
        """The single reuse candidate at the stricter bar (ref
        getBestQuery :140-156); None = run the query yourself."""
        hits = self.find_similar(question, min_similarity, 1, min_confidence)
        return hits[0] if hits else None

    def result_of(self, entry: dict) -> DataFrame | None:
        p = entry.get("result_path")
        if p and os.path.exists(os.path.join(p, "_SUCCESS")):
            return self.spark.read.parquet(p)
        return None

    def get_or_run(self, question: str, query: str, builder,
                   confidence: float = 1.0) -> tuple[DataFrame, bool]:
        """-> (result, was_hit). On miss, runs ``builder()`` and caches
        its materialized rows for the next exact or paraphrased ask."""
        hit = self.best(question)
        if hit is not None:
            cached = self.result_of(hit)
            if cached is not None:
                return cached, True
        t0 = time.time()
        df = builder()
        self.add(question, query, result=df, confidence=confidence,
                 execution_time=time.time() - t0)
        return df, False

    def stats(self) -> dict:
        """Aggregate stats (ref QueryCacheStats)."""
        entries = list(self._load().values())
        n = len(entries)
        ok = [e for e in entries if e["success"]]
        return {
            "total_queries": n,
            "successful_queries": len(ok),
            "average_execution_time":
                sum(e["execution_time"] for e in ok) / len(ok) if ok else 0.0,
            "average_confidence":
                sum(e["confidence"] for e in ok) / len(ok) if ok else 0.0,
        }
