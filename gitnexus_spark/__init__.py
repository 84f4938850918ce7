"""gitnexus_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first reimagining of the query/data-processing
capabilities of abhigyanpatwari/GitNexus (reference at /root/reference,
TypeScript browser app), retargeted from code repositories to
Common-Crawl-style web pages:

    pages(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Four passes (reference: src/core/ingestion/pipeline.ts:32-136):

  pass 1  deterministic HTML -> text extraction  (functions/html.py)
  pass 1b structure graph: Corpus/Domain/Page + CONTAINS
          (operators/structure.py; ref structure-processor.ts:55-255)
  pass 2  vectorized mention + (subj,pred,obj) triple + link extraction
          (operators/extract.py; ref parsing-processor.ts / import-processor.ts)
  pass 3  3-stage entity linking + connected-components canonicalization
          (operators/linking.py, operators/components.py;
           ref call-processor.ts:146-300 + trie.ts)
  pass 4  nodes/edges materialization, partitioned by label/type
          (plans/pipeline.py; ref kuzu.service.ts:74-223)

Everything is DataFrame-declarative; per-document work (HTML parse, regex
extraction) runs inside Arrow-batched ``mapInPandas`` stages — no
row-at-a-time Python UDFs anywhere.
"""

__version__ = "0.1.0"
