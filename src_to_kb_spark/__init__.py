"""src_to_kb_spark — PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of vezlo/src-to-kb
(reference at /root/reference, read-only) as an idiomatic Spark
DataFrame pipeline over Common-Crawl-style web-page tables:

    pages(url, warc_ts, html, text, lang)
      -> extract   (vectorized Arrow UDF; byte-identical cleaning)
      -> chunk     (pandas UDF + posexplode; reference-exact packing)
      -> mentions  (broadcast gazetteer join, JVM-side tokenization)
      -> link      (candidate join + scoring + window top-1)
      -> canonicalize (MinHash-LSH + connected components)
      -> triples   (partitioned node/edge tables)

plus the reference's query layer (keyword search, modes, stats,
similar-files) and large-scale pipeline operators (dedup families,
similarity search, text analysis).
"""

__version__ = "0.1.0"
