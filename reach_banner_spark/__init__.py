"""reach_banner_spark — a from-scratch PySpark-native KG-construction engine.

Re-creates the query and data-processing capabilities of the reference
(clulab/reach-banner: BANNER CRF gene-mention recognizer packaged for the
Reach reading system) as an idiomatic Spark DataFrame pipeline:

- mention detection (tokenize -> hashed sparse features -> Viterbi) as ONE
  fused Arrow-batched ``mapInPandas`` stage — never per-row Python;
- entity linking via broadcast dictionary join + MinHash-LSH blocking;
- canonicalization via hand-rolled connected components (DataFrame ops);
- (subj, pred, obj) triple assembly per conversation window;
- partitioned graph-table materialization with per-partition checkpoints.

Reference parity notes live in each module's docstring (the reference tree
is empty in this sandbox — see SURVEY.md §0 — so citations are to public
BANNER package structure, tagged [P], not file:line).
"""

__version__ = "0.1.0"
