"""Training-data pipeline operators over Ray Data (beyond the reference).

The reference (cmlburnett/pypdfproc) is a single-document library with no
relational/dataflow layer (SURVEY.md §2.9).  These modules add the
operations a large-scale training-data pipeline needs, each expressed
Ray-Data-first (map_batches over zero-copy Arrow, broadcast small sides,
partial pre-aggregation before any groupby shuffle):

- textstats:   token counts, quality scoring, language-ID, fingerprints
- dedup:       exact, n-gram Jaccard, MinHash+LSH, SimHash
- similarity:  embedding near-dup pairs, brute-force ANN top-k, LSH ANN
- relational:  broadcast joins / pre-aggregated groupbys / sessionize
- multimodal:  opaque-binary decode stages (stubbed codecs, real plumbing)

Every operator with SQL-expressible semantics has a DuckDB oracle in
``__ray_entry__.oracle_sql()``; value equality is engineered (identical
integer arithmetic, shared half-up rounding — see ``common.round_half_up``).
"""
