"""KG-pipeline operators exposed as oracle-checkable queries (SURVEY.md §2.1/§2.3).

These keys cover the BANNER-semantics operators whose *relational algebra*
DuckDB can express — the SQL twins prove the span/segment/join logic while
the CRF-specific keys (Viterbi etc.) are covered by pytest goldens and
rows-only checks.

Reference parity notes per key:
- ``shape_features``  : P4 word-shape pipes (nested regexp_replace twin)
- ``tokenize_count``  : P2 SimpleTokenizer twin (regexp_extract_all)
- ``paren_filter``    : P12 ParenthesisPostProcessor
- ``dict_join``       : P14 DictionaryTagger (broadcast join over tokens)
- ``mention_assembly``: P11 contiguous-run span assembly (window segmentation)
- ``eval_tp_join`` / ``eval_pr``: P15 BC2GeneMentionTest joins -> P/R/F1
- ``connected_components``: G3 on a chain graph derived from doc_ids
- ``triple_assembly`` : G4 windowed pairing + role/tool predicate rules
- KG consumption over the materialized triple table: ``kg_pred_dist``
  ``kg_degree`` ``kg_two_hop`` ``kg_conv_summary`` ``kg_temporal_span``
  ``kg_cooccur_lift`` ``kg_triangles`` ``kg_clustering`` (all oracled),
  ``kg_reach`` (oracle = DuckDB RECURSIVE CTE BFS), ``kg_pagerank`` /
  ``kg_communities`` (∅-oracle, pinned == numpy/pandas twins)
- ``join_skew_salted``: G5 — salted join whose RESULT must equal a plain join
- ``lsh_candidate_pairs`` / ``minhash_bands``: G1 (∅-oracle; pytest goldens)
- ``udf_*``           : §2.5 pandas-UDF surface (each with a JVM-SQL twin)
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

QueryFn = Callable[[SparkSession, str], DataFrame]
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(key: str, sql: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[key] = (fn, sql)
        return fn

    return deco


def _docs(spark, sf):
    from ..caching import cached_scan

    return cached_scan(spark, f"{sf}/documents.parquet")


# shared mini-lexicon over the documents vocabulary (DictionaryTagger dim table)
PIPE_DICT = [
    ("data", 1), ("query", 2), ("table", 3), ("join", 4),
    ("filter", 5), ("spark", 6), ("stream", 7), ("row", 8),
]
_DICT_SQL_VALUES = ", ".join(f"('{w}', {i})" for w, i in PIPE_DICT)


def _dict_df(spark):
    return spark.createDataFrame(PIPE_DICT, ["term", "term_id"])


def _doc_tokens(spark, sf):
    """documents exploded to (doc_id, pos, word) — whitespace tokens."""
    d = _docs(spark, sf)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )


_DOC_TOKENS_SQL = (
    "SELECT doc_id, CAST(generate_subscripts(words, 1) - 1 AS INT) AS pos, "
    "unnest(words) AS word FROM ("
    "SELECT doc_id, string_split(text, ' ') AS words FROM documents) t"
)


# ------------------------------------------------------------ P2/P4/P12 ----

@register(
    "shape_features",
    "SELECT doc_id, REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE("
    "SUBSTRING(text, 1, 20), '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'), "
    "'[0-9]', '0', 'g') AS shape FROM documents",
)
def shape_features(spark, sf):
    d = _docs(spark, sf)
    shape = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.substring("text", 1, 20), "[A-Z]", "A"),
            "[a-z]",
            "a",
        ),
        "[0-9]",
        "0",
    )
    return d.select("doc_id", shape.alias("shape"))


@register(
    "tokenize_count",
    "SELECT doc_id, CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9]+')) AS BIGINT)"
    " AS n_tokens FROM documents",
)
def tokenize_count(spark, sf):
    d = _docs(spark, sf)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[A-Za-z0-9]+"), F.lit(0)))
        .cast("long")
        .alias("n_tokens"),
    )


@register(
    "paren_filter",
    "SELECT doc_id FROM documents WHERE "
    "LENGTH(text) - LENGTH(REPLACE(text, '(', '')) = "
    "LENGTH(text) - LENGTH(REPLACE(text, ')', ''))",
)
def paren_filter(spark, sf):
    from ..operators.mentions import paren_balanced

    d = _docs(spark, sf)
    # only () occurs in the documents corpus; the full operator also
    # balances [] and {} (see operators.mentions.paren_balanced)
    bal = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit("("), F.lit("")))
    ) == (F.length("text") - F.length(F.replace(F.col("text"), F.lit(")"), F.lit(""))))
    return d.filter(bal).select("doc_id")


# ------------------------------------------------------------------ P14 ----

@register(
    "dict_join",
    f"SELECT doc_id, pos, word, term_id FROM ({_DOC_TOKENS_SQL}) toks "
    f"JOIN (VALUES {_DICT_SQL_VALUES}) AS d(term, term_id) ON word = term",
)
def dict_join(spark, sf):
    toks = _doc_tokens(spark, sf)
    dic = _dict_df(spark)
    return toks.join(
        F.broadcast(dic), toks["word"] == dic["term"]
    ).select("doc_id", "pos", "word", "term_id")


@register(
    "dict_join_ngram",
    # DictionaryTagger over token n-grams (n=2): the reference matches
    # multi-token lexicon entries against every token window [P
    # banner.tagging.dictionary.DictionaryTagger]
    f"SELECT a.doc_id, a.pos AS begin_pos, a.word || ' ' || b.word AS surface "
    f"FROM ({_DOC_TOKENS_SQL}) a JOIN ({_DOC_TOKENS_SQL}) b "
    f"ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
    f"WHERE a.word || ' ' || b.word IN "
    f"('data query', 'query table', 'join filter', 'stream row', 'table scan')",
)
def dict_join_ngram(spark, sf):
    toks = _doc_tokens(spark, sf)
    bigrams = ["data query", "query table", "join filter", "stream row", "table scan"]
    dic = spark.createDataFrame([(b,) for b in bigrams], ["term"])
    a = toks.select("doc_id", F.col("pos").alias("begin_pos"), F.col("word").alias("w1"))
    b = toks.select("doc_id", (F.col("pos") - 1).alias("begin_pos"), F.col("word").alias("w2"))
    grams = a.join(b, ["doc_id", "begin_pos"]).select(
        "doc_id", "begin_pos", F.concat_ws(" ", "w1", "w2").alias("surface")
    )
    return grams.join(F.broadcast(dic), grams["surface"] == dic["term"]).select(
        "doc_id", "begin_pos", "surface"
    )


# ------------------------------------------------------------------ P11 ----

@register(
    "mention_assembly",
    # contiguous runs of dictionary words form one mention (B/I run-length
    # assembly as window segmentation: seg = pos - dense rank among hits)
    f"SELECT doc_id, CAST(MIN(pos) AS INT) AS begin_pos, "
    f"CAST(MAX(pos) AS INT) AS end_pos, CAST(COUNT(*) AS BIGINT) AS n_toks, "
    f"STRING_AGG(word, ' ' ORDER BY pos) AS surface FROM ("
    f" SELECT doc_id, pos, word, pos - ROW_NUMBER() OVER ("
    f"  PARTITION BY doc_id ORDER BY pos) AS seg"
    f" FROM ({_DOC_TOKENS_SQL}) toks"
    f" WHERE word IN (SELECT term FROM (VALUES {_DICT_SQL_VALUES}) AS d(term, term_id))"
    f") GROUP BY doc_id, seg",
)
def mention_assembly(spark, sf):
    toks = _doc_tokens(spark, sf)
    dic = _dict_df(spark)
    hits = toks.join(F.broadcast(dic), toks["word"] == dic["term"]).select(
        "doc_id", "pos", "word"
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    segged = hits.withColumn("seg", F.col("pos") - F.row_number().over(w))
    return segged.groupBy("doc_id", "seg").agg(
        F.min("pos").cast("int").alias("begin_pos"),
        F.max("pos").cast("int").alias("end_pos"),
        F.count(F.lit(1)).alias("n_toks"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("word")))
                ),
                lambda s: s["word"],
            ),
            " ",
        ).alias("surface"),
    ).drop("seg")


# ------------------------------------------------------------------ P15 ----
# BC2-style eval: predicted = dictionary hits; gold = dictionary hits with
# len(word) >= 5 (a deterministic subset). TP by exact-position join,
# FP/FN via anti joins, then P/R/F1.

_PRED_SQL = (
    f"SELECT doc_id, pos, word FROM ({_DOC_TOKENS_SQL}) toks "
    f"WHERE word IN (SELECT term FROM (VALUES {_DICT_SQL_VALUES}) AS d(term, term_id))"
)
_GOLD_SQL = f"SELECT doc_id, pos, word FROM ({_PRED_SQL}) p WHERE LENGTH(word) >= 5"

# ---- ALTGENE-style alternative-credit eval (P15 / SURVEY §5.2.2) ----
# The BC2 protocol: a predicted span is TP if it matches the gold span OR
# any listed alternative for that gold; recall credits a gold if its own
# span or any of its alternatives was predicted. To exercise both sides the
# gold dictionary is a SUPERSET of the predictor's (PIPE_DICT plus words
# the predictor never emits), and each gold's alternative is the adjacent
# token at pos+1 (an alternate-boundary stand-in: BC2 alternatives are
# mostly boundary variants of the same mention).
GOLD_EXTRA = ["window", "column", "vector"]
_GOLD_EXTRA_SQL = ", ".join(f"('{w}')" for w in GOLD_EXTRA)
_GOLD_ALT_SQL = (
    f"SELECT doc_id, pos, word FROM ({_DOC_TOKENS_SQL}) toks "
    f"WHERE LENGTH(word) >= 5 AND (word IN (SELECT term FROM (VALUES "
    f"{_DICT_SQL_VALUES}) AS d(term, term_id)) OR word IN (SELECT w FROM "
    f"(VALUES {_GOLD_EXTRA_SQL}) AS e(w)))"
)
_ALT_SQL = (
    f"SELECT g.doc_id, g.pos AS gold_pos, t.pos AS pos "
    f"FROM ({_GOLD_ALT_SQL}) g JOIN ({_DOC_TOKENS_SQL}) t "
    f"ON t.doc_id = g.doc_id AND t.pos = g.pos + 1"
)


def _pred_gold(spark, sf):
    toks = _doc_tokens(spark, sf)
    dic = _dict_df(spark)
    pred = toks.join(F.broadcast(dic), toks["word"] == dic["term"]).select(
        "doc_id", "pos", "word"
    )
    gold = pred.filter(F.length("word") >= 5)
    return pred, gold


def _gold_alt(spark, sf):
    """ALTGENE-style gold + alternatives (see the SQL-twin comment above).

    ``gold``: (doc_id, pos, word) over the superset dictionary, len >= 5.
    ``alt``:  (doc_id, gold_pos, pos) — one alternative span per gold (the
    adjacent token), keyed back to its gold so recall can credit a gold
    whose alternative (not its own span) was predicted.
    """
    toks = _doc_tokens(spark, sf)
    dic = _dict_df(spark).select("term")
    extra = spark.createDataFrame([(w,) for w in GOLD_EXTRA], ["term"])
    gold_terms = dic.unionByName(extra).distinct()
    gold = (
        toks.filter(F.length("word") >= 5)
        .join(F.broadcast(gold_terms), toks["word"] == gold_terms["term"])
        .select("doc_id", "pos", "word")
    )
    alt = (
        gold.alias("g")
        .join(
            toks.alias("t"),
            (F.col("t.doc_id") == F.col("g.doc_id"))
            & (F.col("t.pos") == F.col("g.pos") + 1),
        )
        .select(
            F.col("g.doc_id").alias("doc_id"),
            F.col("g.pos").alias("gold_pos"),
            F.col("t.pos").alias("pos"),
        )
    )
    return gold, alt


@register(
    "eval_tp_join",
    f"SELECT p.doc_id, p.pos, p.word FROM ({_PRED_SQL}) p "
    f"JOIN ({_GOLD_SQL}) g ON p.doc_id = g.doc_id AND p.pos = g.pos",
)
def eval_tp_join(spark, sf):
    pred, gold = _pred_gold(spark, sf)
    return pred.join(
        gold.select("doc_id", "pos"), ["doc_id", "pos"], "left_semi"
    ).select("doc_id", "pos", "word")


@register(
    "eval_pr",
    f"WITH p AS ({_PRED_SQL}), g AS ({_GOLD_SQL}), "
    f"tp AS (SELECT p.doc_id, p.pos FROM p JOIN g ON p.doc_id=g.doc_id AND p.pos=g.pos) "
    f"SELECT CAST((SELECT COUNT(*) FROM tp) AS BIGINT) AS tp, "
    f"CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_pred, "
    f"CAST((SELECT COUNT(*) FROM g) AS BIGINT) AS n_gold, "
    f"ROUND((SELECT COUNT(*) FROM tp) * 1.0 / GREATEST((SELECT COUNT(*) FROM p), 1), 6) AS precision_, "
    f"ROUND((SELECT COUNT(*) FROM tp) * 1.0 / GREATEST((SELECT COUNT(*) FROM g), 1), 6) AS recall_",
)
def eval_pr(spark, sf):
    # ONE Spark job (r2 VERDICT #5): flag full-outer join -> single
    # aggregate producing (tp, n_pred, n_gold) together, P/R derived in the
    # same projection — no serial driver-side .count() actions
    pred, gold = _pred_gold(spark, sf)
    p = pred.select("doc_id", "pos", F.lit(1).alias("is_pred"))
    g = gold.select("doc_id", "pos", F.lit(1).alias("is_gold"))
    # coalesce every SUM: over an empty join SUM yields NULL while the
    # DuckDB oracle's COUNT(*) yields 0 — an empty pred+gold corpus must
    # produce (0, 0, 0, 0, 0), not NULLs (ADVICE r3)
    agg = (
        p.join(g, ["doc_id", "pos"], "full_outer")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("is_pred").isNotNull() & F.col("is_gold").isNotNull(),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("tp"),
            F.coalesce(F.sum(F.coalesce("is_pred", F.lit(0))), F.lit(0)).alias(
                "n_pred"
            ),
            F.coalesce(F.sum(F.coalesce("is_gold", F.lit(0))), F.lit(0)).alias(
                "n_gold"
            ),
        )
    )
    return agg.select(
        F.col("tp").cast("long").alias("tp"),
        F.col("n_pred").cast("long").alias("n_pred"),
        F.col("n_gold").cast("long").alias("n_gold"),
        F.round(F.col("tp") / F.greatest(F.col("n_pred"), F.lit(1)), 6).alias(
            "precision_"
        ),
        F.round(F.col("tp") / F.greatest(F.col("n_gold"), F.lit(1)), 6).alias(
            "recall_"
        ),
    )


@register(
    "eval_pr_alt",
    f"WITH p AS ({_PRED_SQL}), g AS ({_GOLD_ALT_SQL}), a AS ({_ALT_SQL}), "
    "cp AS (SELECT DISTINCT p.doc_id, p.pos FROM p WHERE "
    " EXISTS (SELECT 1 FROM g WHERE g.doc_id = p.doc_id AND g.pos = p.pos) OR"
    " EXISTS (SELECT 1 FROM a WHERE a.doc_id = p.doc_id AND a.pos = p.pos)), "
    "cg AS (SELECT DISTINCT g.doc_id, g.pos FROM g WHERE "
    " EXISTS (SELECT 1 FROM p WHERE p.doc_id = g.doc_id AND p.pos = g.pos) OR"
    " EXISTS (SELECT 1 FROM a JOIN p ON p.doc_id = a.doc_id AND p.pos = a.pos"
    "         WHERE a.doc_id = g.doc_id AND a.gold_pos = g.pos)) "
    "SELECT CAST((SELECT COUNT(*) FROM cp) AS BIGINT) AS tp_pred, "
    "CAST((SELECT COUNT(*) FROM cg) AS BIGINT) AS cred_gold, "
    "CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_pred, "
    "CAST((SELECT COUNT(*) FROM g) AS BIGINT) AS n_gold, "
    "ROUND((SELECT COUNT(*) FROM cp) * 1.0 / "
    " GREATEST((SELECT COUNT(*) FROM p), 1), 6) AS precision_, "
    "ROUND((SELECT COUNT(*) FROM cg) * 1.0 / "
    " GREATEST((SELECT COUNT(*) FROM g), 1), 6) AS recall_",
)
def eval_pr_alt(spark, sf):
    """P15 with ALTGENE alternative-span credit (SURVEY §2.1 P15, §5.2.2):
    a prediction is TP if it matches the gold span OR any alternative; a
    gold is found if its span or any of its alternatives was predicted.
    Precision counts credited predictions; recall counts credited golds —
    the BC2 alt_eval protocol re-expressed as flag left-joins + one
    aggregate per side (both joins are 1:1 by construction: spans are
    unique per (doc_id, pos), one alternative per gold)."""
    pred, _ = _pred_gold(spark, sf)
    gold, alt = _gold_alt(spark, sf)

    p = pred.select("doc_id", "pos")
    g_direct = gold.select("doc_id", "pos", F.lit(1).alias("hit_gold"))
    a_span = alt.select("doc_id", "pos", F.lit(1).alias("hit_alt"))
    p_cred = (
        p.join(g_direct, ["doc_id", "pos"], "left")
        .join(a_span, ["doc_id", "pos"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_pred"),
            # coalesce: SUM over zero rows is NULL, oracle COUNT is 0
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("hit_gold").isNotNull()
                        | F.col("hit_alt").isNotNull(),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("tp_pred"),
        )
    )
    g = gold.select("doc_id", F.col("pos").alias("gold_pos"))
    p_direct = pred.select(
        "doc_id", F.col("pos").alias("gold_pos"), F.lit(1).alias("p_direct")
    )
    p_alt = (
        alt.join(pred.select("doc_id", "pos"), ["doc_id", "pos"])
        .select("doc_id", "gold_pos", F.lit(1).alias("p_alt"))
    )
    g_cred = (
        g.join(p_direct, ["doc_id", "gold_pos"], "left")
        .join(p_alt, ["doc_id", "gold_pos"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_gold"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("p_direct").isNotNull()
                        | F.col("p_alt").isNotNull(),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("cred_gold"),
        )
    )
    return p_cred.crossJoin(g_cred).select(
        F.col("tp_pred").cast("long").alias("tp_pred"),
        F.col("cred_gold").cast("long").alias("cred_gold"),
        F.col("n_pred").cast("long").alias("n_pred"),
        F.col("n_gold").cast("long").alias("n_gold"),
        F.round(F.col("tp_pred") / F.greatest(F.col("n_pred"), F.lit(1)), 6).alias(
            "precision_"
        ),
        F.round(F.col("cred_gold") / F.greatest(F.col("n_gold"), F.lit(1)), 6).alias(
            "recall_"
        ),
    )


# ------------------------------------------------------------------- G3 ----

@register(
    "connected_components",
    # chain graph: edge (d, d+1) whenever d % 10 != 9 and d+1 is a doc ->
    # components are decades; oracle derives comp arithmetically (DuckDB's
    # recursive-CTE answer reduces to this closed form on a chain)
    "WITH ids AS (SELECT doc_id FROM documents), "
    "e AS (SELECT a.doc_id AS src, a.doc_id + 1 AS dst FROM ids a "
    " WHERE a.doc_id % 10 <> 9 AND EXISTS "
    " (SELECT 1 FROM ids b WHERE b.doc_id = a.doc_id + 1)), "
    "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e) "
    "SELECT node, node - node % 10 AS comp FROM nodes",
)
def connected_components_q(spark, sf):
    from ..operators.components import connected_components

    d = _docs(spark, sf).select("doc_id")
    a = d.withColumnRenamed("doc_id", "src")
    edges = (
        a.filter(F.col("src") % 10 != 9)
        .withColumn("dst", F.col("src") + 1)
        .join(d.withColumnRenamed("doc_id", "dst"), "dst", "left_semi")
        .select("src", "dst")
    )
    return connected_components(edges).select("node", "comp")


# ------------------------------------------------------------------- G4 ----

_TURNS_SQL = (
    "SELECT CAST(source AS VARCHAR) AS conv_id, "
    "CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS INT) AS turn_idx, "
    "CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' "
    " WHEN 2 THEN 'system' ELSE 'tool' END AS role, "
    "text, "
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN '' WHEN 1 THEN 'search' "
    " ELSE 'python' END AS tool "
    "FROM documents"
)

_TMENTIONS_SQL = (
    f"SELECT conv_id, turn_idx, begin_char, word AS canonical FROM ("
    f"SELECT t.conv_id, t.turn_idx, "
    f"CAST(generate_subscripts(string_split(t.text, ' '), 1) - 1 AS INT) AS begin_char, "
    f"unnest(string_split(t.text, ' ')) AS word FROM ({_TURNS_SQL}) t) x "
    f"WHERE word IN (SELECT term FROM (VALUES {_DICT_SQL_VALUES}) AS d(term, term_id))"
)


# the assembled triple set as a reusable SQL fragment: triple_assembly's
# own oracle, and the FROM-clause of the KG-consumption oracles below
# (DuckDB accepts a WITH inside a derived-table subquery)
_TRIPLES_SQL = (
    f"WITH turns AS ({_TURNS_SQL}), m AS (SELECT DISTINCT * FROM ({_TMENTIONS_SQL})) "
    "SELECT DISTINCT a.conv_id, CAST(a.turn_idx AS INT) AS window_start, "
    "a.canonical AS subj, "
    "CASE WHEN a.turn_idx = b.turn_idx THEN 'co_mentioned' "
    " WHEN t.role = 'assistant' AND t.tool <> '' THEN 'derived_via_' || t.tool "
    " WHEN t.role = 'assistant' THEN 'answered_with' "
    " WHEN t.role = 'user' THEN 'asked_about' "
    " WHEN t.role = 'tool' THEN 'observed_with' "
    " ELSE 'followed_by' END AS pred, "
    "b.canonical AS obj "
    "FROM m a JOIN m b ON a.conv_id = b.conv_id "
    " AND b.turn_idx BETWEEN a.turn_idx AND a.turn_idx + 2 "
    " AND (a.turn_idx < b.turn_idx OR (a.turn_idx = b.turn_idx AND a.begin_char < b.begin_char)) "
    " AND a.canonical <> b.canonical "
    "JOIN turns t ON t.conv_id = b.conv_id AND t.turn_idx = b.turn_idx"
)


def _turn_mentions(spark, sf):
    """(turns, mentions) over the transcript view — dictionary mentions
    per (conv_id, turn_idx, begin_char). Shared by triple assembly and
    the conversation-summary key."""
    from ..sources.transcripts import documents_as_turns

    turns = documents_as_turns(spark, sf)
    toks = turns.select(
        "conv_id",
        "turn_idx",
        F.posexplode(F.split("text", " ")).alias("pos", "word"),
    )
    dic = _dict_df(spark)
    mentions = toks.join(F.broadcast(dic), toks["word"] == dic["term"]).select(
        "conv_id",
        "turn_idx",
        F.col("pos").cast("int").alias("begin_char"),
        F.col("word").alias("canonical"),
    )
    return turns, mentions


def _triples(spark, sf):
    """Assembled (conv_id, window_start, subj, pred, obj) triples — the
    shared input of the KG-consumption keys (same DataFrame
    ``triple_assembly`` returns)."""
    from ..operators.triples import assemble_triples

    turns, mentions = _turn_mentions(spark, sf)
    return assemble_triples(mentions, turns, window_turns=2)


# bump to invalidate materialized triple tables when assembly semantics
# or the transcript view change
_TRIPLES_TABLE_VERSION = "v1"


def _triples_table(spark, sf):
    """The MATERIALIZED triple table (G7 layout: conv_id-bucketed
    partitioned parquet + manifest) — what the consumption keys read.

    A production KG pipeline assembles triples once and publishes the
    graph table; consumption queries (degree, two-hop, rollups, pagerank)
    read that table rather than re-deriving the graph per query (r4
    VERDICT: the re-derivation was kg_conv_summary's residual cost).
    Materialized once per (corpus-content, version) under /tmp — the dir
    key includes a content fingerprint of the source parquet (size/mtime
    per file), so two corpora sharing a basename, or a corpus regenerated
    in place, never silently serve stale triples (the same guard the
    staged stream corpora use). Deterministic content (fixed dict, no
    RNG), pid-staged + atomically renamed so two processes cannot
    interleave a partial write; losers of the rename race drop their
    staging copy and read the winner's table."""
    import os
    import shutil
    import tempfile

    from ..sources import tables
    from ..tmputil import source_fingerprint, sweep_dead_dirs

    src_fp = source_fingerprint(f"{sf.rstrip('/')}/documents.parquet")
    base = os.path.join(
        tempfile.gettempdir(),
        f"rbs_triples_tbl_{os.path.basename(sf.rstrip('/'))}_{src_fp}_"
        f"{_TRIPLES_TABLE_VERSION}",
    )
    if not os.path.exists(os.path.join(base, "_rbs_manifest.json")):
        # sweep staging dirs whose owning process died mid-write
        sweep_dead_dirs(f"{base}.p", keep_own=True)
        staging = f"{base}.p{os.getpid()}"
        tables.write_graph_table(
            _triples(spark, sf), staging, bucket_col="conv_id",
            snapshot_note=f"kg_queries triples {_TRIPLES_TABLE_VERSION}",
        )
        try:
            os.rename(staging, base)
        except OSError:  # another process won the race; its table is whole
            shutil.rmtree(staging, ignore_errors=True)
    # the table path is content-fingerprinted + versioned (write-once:
    # new corpus content -> new path), so the LAZY read caches per
    # (SparkContext, path) — ~60 KG-consumption keys each re-paid the
    # manifest read + multi-file parquet listing/schema per invocation
    # (the caching.cached_scan rationale; data is still scanned per
    # action)
    from ..caching import _EXPR_CACHE
    from pyspark import SparkContext

    ctx = id(SparkContext._active_spark_context)
    key = ("triples_tbl", ctx, base)
    hit = _EXPR_CACHE.get(key)
    if hit is not None and hit[0] == ctx:
        return hit[1]
    val = tables.read_graph_table(spark, base)
    _EXPR_CACHE[key] = (ctx, val)
    return val


@register("triple_assembly", _TRIPLES_SQL)
def triple_assembly(spark, sf):
    return _triples(spark, sf)


# --------------------------------------------- KG consumption (post-G4) ----
# Once the graph is materialized, users query it. Three canonical access
# patterns over the triple table, each a pure relational plan (partial
# aggregation map-side, shuffles only on the grouping/join keys — all
# scale-safe because the triple table is already partitioned by conv_id
# and every query below keys on conv_id first or reduces to a tiny
# predicate-domain aggregate):


@register(
    "kg_pred_dist",
    f"SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_triples, "
    "CAST(COUNT(DISTINCT subj) AS BIGINT) AS n_subj, "
    "CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs "
    f"FROM ({_TRIPLES_SQL}) tr GROUP BY pred",
)
def kg_pred_dist(spark, sf):
    """Predicate histogram: how the graph's edge types distribute. The
    predicate domain is tiny (role/tool rules), so the final shuffle
    carries one partial row per (partition, pred) — safe at any scale."""
    return _triples_table(spark, sf).groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("subj").alias("n_subj"),
        F.countDistinct("conv_id").alias("n_convs"),
    )


@register(
    "kg_degree",
    f"WITH t AS ({_TRIPLES_SQL}), "
    "e AS (SELECT conv_id, subj AS entity, obj AS nbr FROM t "
    " UNION SELECT conv_id, obj, subj FROM t) "
    "SELECT conv_id, entity, CAST(COUNT(*) AS BIGINT) AS degree "
    "FROM e GROUP BY conv_id, entity",
)
def kg_degree(spark, sf):
    """Per-conversation undirected entity degree (distinct neighbours):
    symmetrize the edge list, distinct, count. Both shuffles key on
    conv_id — co-partitioned with the triple table's layout, so at scale
    this is one local-exchange aggregation per partition."""
    t = _triples_table(spark, sf)
    sym = t.select("conv_id", F.col("subj").alias("entity"), F.col("obj").alias("nbr")).unionByName(
        t.select("conv_id", F.col("obj").alias("entity"), F.col("subj").alias("nbr"))
    )
    return (
        sym.distinct()
        .groupBy("conv_id", "entity")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


@register(
    "macro_kg_report",
    f"WITH t AS ({_TRIPLES_SQL}), "
    "base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triples, "
    " CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs, "
    " CAST(COUNT(DISTINCT pred) AS BIGINT) AS n_preds FROM t), "
    "ent AS (SELECT CAST(COUNT(DISTINCT e) AS BIGINT) AS n_entities FROM "
    " (SELECT subj AS e FROM t UNION SELECT obj FROM t) x), "
    "top AS (SELECT pred AS top_pred FROM "
    " (SELECT pred, COUNT(*) AS c FROM t GROUP BY pred "
    "  ORDER BY c DESC, pred LIMIT 1) y) "
    "SELECT n_triples, n_convs, n_preds, n_entities, top_pred, "
    "printf('%.6f', ROUND(n_triples * 1.0 / n_convs, 6)) "
    "AS triples_per_conv FROM base, ent, top",
)
def macro_kg_report(spark, sf):
    """The one-row KG health report — the macro query a graph publisher
    runs after every build (triple volume, conversation/entity/predicate
    domains, the dominant predicate, density per conversation). Four
    dimension-sized aggregates over the materialized triple table, each
    a partial-merge pass, combined by broadcasting 1-row results; the
    top predicate is a TakeOrderedAndProject over the predicate-domain
    count table with the (count DESC, pred ASC) deterministic tie-break.
    Density emitted as a %.6f ROUND-then-format string (float rule)."""
    t = _triples_table(spark, sf)
    base = t.agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.countDistinct("pred").alias("n_preds"),
    )
    ent = (
        t.select(F.col("subj").alias("e"))
        .unionByName(t.select(F.col("obj").alias("e")))
        .agg(F.countDistinct("e").alias("n_entities"))
    )
    top = (
        t.groupBy("pred")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("pred"))
        .limit(1)
        .select(F.col("pred").alias("top_pred"))
    )
    return (
        base.crossJoin(F.broadcast(ent))
        .crossJoin(F.broadcast(top))
        .select(
            "n_triples",
            "n_convs",
            "n_preds",
            "n_entities",
            "top_pred",
            F.format_string(
                "%.6f",
                F.round(
                    F.col("n_triples").cast("double") / F.col("n_convs"), 6
                ),
            ).alias("triples_per_conv"),
        )
    )


@register(
    "kg_degree_dist",
    f"WITH t AS ({_TRIPLES_SQL}), "
    "e AS (SELECT conv_id, subj AS entity, obj AS nbr FROM t "
    " UNION SELECT conv_id, obj, subj FROM t), "
    "deg AS (SELECT conv_id, entity, CAST(COUNT(*) AS BIGINT) AS degree "
    " FROM e GROUP BY conv_id, entity) "
    "SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes, "
    "CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs "
    "FROM deg GROUP BY degree",
)
def kg_degree_dist(spark, sf):
    """Degree distribution of the KG — the first thing anyone plots over
    a graph they just built (scale-free? truncated? broken assembler?).
    Rolls ``kg_degree``'s per-(conv, entity) degrees up to a histogram:
    degree -> node count + conversations touched. The second aggregate's
    key domain is the degree range (bounded by the per-conv entity
    domain, not the corpus), so the added shuffle after the conv_id-keyed
    degree pass carries one partial row per (partition, degree) — at
    10^12 turns the histogram still fits on a screen. Exact integers
    throughout."""
    deg = kg_degree(spark, sf)
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.countDistinct("conv_id").alias("n_convs"),
    )


@register(
    "kg_conv_summary",
    f"WITH turns AS ({_TURNS_SQL}), "
    f"m AS (SELECT DISTINCT * FROM ({_TMENTIONS_SQL})), "
    f"tr AS (SELECT * FROM ({_TRIPLES_SQL}) x), "
    "ta AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns "
    " FROM turns GROUP BY conv_id), "
    "ma AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_mentions, "
    " CAST(COUNT(DISTINCT canonical) AS BIGINT) AS n_entities "
    " FROM m GROUP BY conv_id), "
    "tra AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_triples "
    " FROM tr GROUP BY conv_id) "
    "SELECT ta.conv_id, n_turns, COALESCE(n_mentions, 0) AS n_mentions, "
    "COALESCE(n_entities, 0) AS n_entities, "
    "COALESCE(n_triples, 0) AS n_triples "
    "FROM ta LEFT JOIN ma ON ma.conv_id = ta.conv_id "
    "LEFT JOIN tra ON tra.conv_id = ta.conv_id",
)
def kg_conv_summary(spark, sf):
    """Per-conversation rollup — turns, mentions, distinct entities,
    triples — the monitoring table a KG-construction run publishes next
    to its checkpoint counters (G6). Three partial aggregates co-keyed on
    conv_id, joined; every shuffle is on conv_id, so at 10^12 turns this
    is one co-partitioned pass over data already laid out by
    conversation. Triples come from the MATERIALIZED graph table
    (``_triples_table``) rather than being re-derived — the rollup is one
    pass over published tables, which is how a monitoring query actually
    runs next to a pipeline (r4 VERDICT #3: the re-derivation was this
    key's residual cost). Mentions now feed a single consumer, so no
    persist is needed."""
    turns, mentions = _turn_mentions(spark, sf)
    t = _triples_table(spark, sf)
    ta = turns.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    ma = (
        mentions.distinct()
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.countDistinct("canonical").alias("n_entities"),
        )
    )
    tra = t.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_triples"))
    return (
        ta.join(ma, "conv_id", "left")
        .join(tra, "conv_id", "left")
        .select(
            "conv_id",
            "n_turns",
            F.coalesce("n_mentions", F.lit(0)).alias("n_mentions"),
            F.coalesce("n_entities", F.lit(0)).alias("n_entities"),
            F.coalesce("n_triples", F.lit(0)).alias("n_triples"),
        )
    )


@register("kg_pagerank", None)  # pytest vs numpy power-iteration twin
def kg_pagerank(spark, sf, iters: int = 10, damping: float = 0.85):
    """PageRank over the directed entity graph (distinct subj->obj edges
    across all conversations): the canonical iterative graph algorithm on
    the materialized KG, spelled as repeated join + groupBy with a
    ``localCheckpoint`` per iteration to cut lineage (the same discipline
    ``connected_components`` uses). Simplified model (dangling mass not
    redistributed), fixed ``iters`` — no convergence probe, so zero
    driver barriers inside the loop. At scale the edge list and the rank
    vector co-partition on the join key; each iteration is one shuffle
    of the (bounded) entity domain, not the conversations.

    Determinism contract: the per-node in-rank reduction is a sorted
    left fold (not F.sum), so emitted ranks are bit-stable across runs
    and partitionings; the numpy twin is compared with atol=2e-6 only
    because ITS accumulation order differs, not because this key's
    output varies."""
    t = _triples_table(spark, sf)
    edges = t.select("subj", "obj").distinct()
    nodes = (
        edges.select(F.col("subj").alias("node"))
        .unionByName(edges.select(F.col("obj").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    outdeg = edges.groupBy("subj").agg(F.count(F.lit(1)).alias("deg"))
    edges = edges.join(outdeg, "subj").localCheckpoint()
    n = nodes.count()
    if n == 0:  # empty graph: degrade to empty, not ZeroDivisionError
        return spark.createDataFrame([], "node string, rank double")
    rank = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = edges.join(
            rank.withColumnRenamed("node", "subj"), "subj"
        ).select(
            F.col("obj").alias("node"), (F.col("rank") / F.col("deg")).alias("c")
        )
        # deterministic reduction: F.sum over doubles inherits the partial-
        # aggregation order (a rank ~1 ulp from a 6-decimal boundary could
        # flip the rounded output between runs — ADVICE r4); collect +
        # array_sort + left fold pins the accumulation order, making the
        # emitted rounded ranks run-to-run stable. The per-node list is
        # bounded by in-degree over the (bounded) entity domain, not by
        # conversations, so the collect_list stays small at 100x.
        agg = contrib.groupBy("node").agg(
            F.aggregate(
                F.array_sort(F.collect_list("c")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("in_rank")
        )
        rank = (
            nodes.join(agg, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce("in_rank", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return rank.select("node", F.round("rank", 6).alias("rank"))


def kg_pagerank_pandas(
    edges: pd.DataFrame, iters: int = 10, damping: float = 0.85
) -> pd.DataFrame:
    """Single-process twin of ``kg_pagerank`` for the golden test:
    ``edges`` has columns (subj, obj); returns (node, rank)."""
    e = edges.drop_duplicates()
    nodes = sorted(set(e["subj"]) | set(e["obj"]))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node": [], "rank": []})
    deg = e.groupby("subj").size()
    src = e["subj"].map(idx).to_numpy()
    dst = e["obj"].map(idx).to_numpy()
    d = e["subj"].map(deg).to_numpy().astype(np.float64)
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        np.add.at(nxt, dst, rank[src] / d)
        rank = (1.0 - damping) / n + damping * nxt
    return pd.DataFrame({"node": nodes, "rank": np.round(rank, 6)})


_HITS_ITERS = 8


@register("kg_hits", None)  # pytest == kg_hits_py twin EXACTLY (sorted folds)
def kg_hits(spark, sf, iters: int = _HITS_ITERS):
    """HITS hubs/authorities over the directed entity graph — PageRank's
    bipartite sibling (an entity that POINTS AT many authorities is a hub;
    one pointed at BY many hubs is an authority — in a KG built from
    transcripts, hubs ≈ active subjects, authorities ≈ common objects).
    Same iterative discipline as ``kg_pagerank``: fixed ``iters`` (zero
    in-loop driver barriers), distinct-edge join + groupBy per half-step,
    ``localCheckpoint`` per round to cut lineage; each half-step shuffles
    the bounded entity domain, not the conversations.

    Determinism contract (stricter than pagerank's): per-node reductions
    are sorted left folds, and normalization divides by the GLOBAL MAX
    score (a max over doubles is order-independent, unlike the L2 norm's
    sum of squares) — so every emitted value is a fixed IEEE op sequence
    and the python twin matches EXACTLY, including the final HALF_UP
    6-decimal rounding (Decimal-mimicked in the twin)."""
    t = _triples_table(spark, sf)
    edges = t.select("subj", "obj").distinct().localCheckpoint()
    nodes = (
        edges.select(F.col("subj").alias("node"))
        .unionByName(edges.select(F.col("obj").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    if nodes.isEmpty():
        return spark.createDataFrame([], "node string, hub double, auth double")

    def _sorted_sum(col):
        return F.aggregate(
            F.array_sort(F.collect_list(col)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def _normalize(scores, col):
        mx = scores.agg(F.max(col).alias("m"))
        return scores.crossJoin(F.broadcast(mx)).select(
            "node", (F.col(col) / F.col("m")).alias(col)
        )

    hub = nodes.withColumn("hub", F.lit(1.0))
    for _ in range(iters):
        a_raw = (
            edges.join(hub.withColumnRenamed("node", "subj"), "subj")
            .groupBy(F.col("obj").alias("node"))
            .agg(_sorted_sum("hub").alias("auth"))
        )
        auth = _normalize(
            nodes.join(a_raw, "node", "left").select(
                "node", F.coalesce("auth", F.lit(0.0)).alias("auth")
            ),
            "auth",
        ).localCheckpoint()
        h_raw = (
            edges.join(auth.withColumnRenamed("node", "obj"), "obj")
            .groupBy(F.col("subj").alias("node"))
            .agg(_sorted_sum("auth").alias("hub"))
        )
        hub = _normalize(
            nodes.join(h_raw, "node", "left").select(
                "node", F.coalesce("hub", F.lit(0.0)).alias("hub")
            ),
            "hub",
        ).localCheckpoint()
    return (
        hub.join(auth, "node")
        .select(
            "node",
            F.round("hub", 6).alias("hub"),
            F.round("auth", 6).alias("auth"),
        )
    )


def kg_hits_py(edges: pd.DataFrame, iters: int = _HITS_ITERS) -> pd.DataFrame:
    """Pure-python twin of ``kg_hits``: same sorted-fold sums, same
    max-normalization, same HALF_UP 6-decimal rounding (via Decimal over
    repr, the JVM F.round semantics). Exact-equality comparable."""
    from decimal import ROUND_HALF_UP, Decimal

    e = edges.drop_duplicates()
    nodes = sorted(set(e["subj"]) | set(e["obj"]))
    if not nodes:
        return pd.DataFrame({"node": [], "hub": [], "auth": []})
    out_adj: dict[str, list[str]] = {}
    in_adj: dict[str, list[str]] = {}
    for s, o in zip(e["subj"], e["obj"]):
        out_adj.setdefault(s, []).append(o)
        in_adj.setdefault(o, []).append(s)

    def half_step(src_scores, adj):
        raw = {}
        for n in nodes:
            vals = sorted(src_scores[m] for m in adj.get(n, []))
            acc = 0.0
            for v in vals:
                acc = acc + v
            raw[n] = acc
        mx = max(raw.values())
        return {n: raw[n] / mx for n in nodes}

    hub = {n: 1.0 for n in nodes}
    for _ in range(iters):
        auth = half_step(hub, in_adj)
        hub = half_step(auth, out_adj)

    q6 = Decimal("0.000001")

    def r6(x: float) -> float:
        return float(Decimal(repr(float(x))).quantize(q6, ROUND_HALF_UP))

    return pd.DataFrame(
        {
            "node": nodes,
            "hub": [r6(hub[n]) for n in nodes],
            "auth": [r6(auth[n]) for n in nodes],
        }
    )


@register(
    "kg_two_hop",
    f"WITH t AS ({_TRIPLES_SQL}) "
    "SELECT a.conv_id, a.subj, b.obj AS obj2, "
    "CAST(COUNT(*) AS BIGINT) AS n_paths "
    "FROM t a JOIN t b ON a.conv_id = b.conv_id AND a.obj = b.subj "
    "WHERE a.subj <> b.obj GROUP BY a.conv_id, a.subj, b.obj",
)
def kg_two_hop(spark, sf):
    """2-hop reachability with path counts: the canonical graph-traversal
    join (a)->(mid)->(c), conversation-scoped. Joining raw triple rows on
    (conv_id, mid) is QUADRATIC in triples-per-conversation (measured
    22.6 s at sf0.1 — a hot conversation with 10^4 triples would build
    10^8 intermediate rows); instead both sides pre-aggregate to distinct
    edges with multiplicities, so the join input is bounded by
    conversations x |entity domain|^2 and the path count is the exact
    same number via sum(n_a * n_b) over the shared midpoint. All three
    shuffles key on conv_id first — co-partitioned with the triple
    table's layout, never crossing conversations."""
    t = _triples_table(spark, sf)
    a = (
        t.select("conv_id", "subj", F.col("obj").alias("mid"))
        .groupBy("conv_id", "subj", "mid")
        .agg(F.count(F.lit(1)).alias("na"))
    )
    b = (
        t.select("conv_id", F.col("subj").alias("mid"), F.col("obj").alias("obj2"))
        .groupBy("conv_id", "mid", "obj2")
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    return (
        a.join(b, ["conv_id", "mid"])
        .filter(F.col("subj") != F.col("obj2"))
        .groupBy("conv_id", "subj", "obj2")
        .agg(F.sum(F.col("na") * F.col("nb")).cast("long").alias("n_paths"))
    )


# -------- shared graph-shape helpers for the analytics keys below --------
# (one definition each for the oriented and symmetrized edge sets, used by
# kg_triangles/kg_clustering and kg_reach/kg_communities respectively, so
# a future orientation or dedup change cannot silently diverge between
# keys; the SQL twins share the same fragments)

# distinct undirected edges in canonical orientation (a < b)
_EDGES_ORIENTED_SQL = (
    "SELECT DISTINCT conv_id, LEAST(subj, obj) AS a, "
    "GREATEST(subj, obj) AS b FROM t WHERE subj <> obj"
)

# distinct symmetrized edges (both directions)
_EDGES_SYM_SQL = (
    "SELECT DISTINCT conv_id, subj AS s, obj AS o FROM t WHERE subj <> obj "
    "UNION SELECT DISTINCT conv_id, obj, subj FROM t WHERE subj <> obj"
)

# node-level triangles over oriented edges e: each triangle x<y<z is
# emitted once as e1=(x,y), e2=(x,z) with z>y, e3=(y,z)
_TRIANGLE_NODES_SQL = (
    "SELECT e1.conv_id, e1.a AS x, e1.b AS y, e2.b AS z FROM e e1 "
    "JOIN e e2 ON e2.conv_id = e1.conv_id AND e2.a = e1.a AND e2.b > e1.b "
    "JOIN e e3 ON e3.conv_id = e1.conv_id AND e3.a = e1.b AND e3.b = e2.b"
)

# per-conv triangle counts (the rollup of the node-level census)
_TRIANGLES_SQL = (
    f"SELECT conv_id, COUNT(*) AS n FROM ({_TRIANGLE_NODES_SQL}) tnode "
    "GROUP BY conv_id"
)


def _oriented_edges(t: DataFrame) -> DataFrame:
    """Distinct undirected (conv_id, a, b) edges with a < b."""
    return (
        t.filter(F.col("subj") != F.col("obj"))
        .select(
            "conv_id",
            F.least("subj", "obj").alias("a"),
            F.greatest("subj", "obj").alias("b"),
        )
        .distinct()
    )


def _sym_edges(t: DataFrame) -> DataFrame:
    """Distinct symmetrized (conv_id, s, o) edges, ``localCheckpoint``ed
    (both consumers iterate joins against it)."""
    half = t.filter(F.col("subj") != F.col("obj")).select(
        "conv_id", F.col("subj").alias("s"), F.col("obj").alias("o")
    )
    return (
        half.unionByName(
            half.select("conv_id", F.col("o").alias("s"), F.col("s").alias("o"))
        )
        .distinct()
        .localCheckpoint()
    )


def _conv_triangle_nodes(e: DataFrame) -> DataFrame:
    """(conv_id, x, y, z) node-level triangles over oriented edges ``e``
    — the DataFrame twin of ``_TRIANGLE_NODES_SQL``; conv_id-first
    equi-joins with the equality/inequality residuals folded into the
    join keys by Catalyst (plan-audited). Shared by the triangle count
    and the K4 census (which extends each triangle by a fourth node)."""
    e2 = e.select("conv_id", F.col("a").alias("a2"), F.col("b").alias("b2"))
    e3 = e.select("conv_id", F.col("a").alias("a3"), F.col("b").alias("b3"))
    return (
        e.join(e2, ["conv_id"])
        .filter((F.col("a2") == F.col("a")) & (F.col("b2") > F.col("b")))
        .join(e3, ["conv_id"])
        .filter((F.col("a3") == F.col("b")) & (F.col("b3") == F.col("b2")))
        .select(
            "conv_id",
            F.col("a").alias("x"),
            F.col("b").alias("y"),
            F.col("b2").alias("z"),
        )
    )


def _conv_triangles(e: DataFrame) -> DataFrame:
    """(conv_id, n) triangle counts over oriented edges ``e`` — the
    DataFrame twin of ``_TRIANGLES_SQL`` (the rollup of
    ``_conv_triangle_nodes``)."""
    return (
        _conv_triangle_nodes(e)
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "kg_cooccur_lift",
    f"WITH t AS ({_TRIPLES_SQL}), "
    "ec AS (SELECT DISTINCT conv_id, subj AS ent FROM t "
    " UNION SELECT DISTINCT conv_id, obj FROM t), "
    "n AS (SELECT CAST(COUNT(DISTINCT conv_id) AS DOUBLE) AS n_convs FROM ec), "
    "ca AS (SELECT ent, COUNT(*) AS c FROM ec GROUP BY ent), "
    "pairs AS (SELECT a.ent AS ea, b.ent AS eb, COUNT(*) AS cab FROM ec a "
    " JOIN ec b ON a.conv_id = b.conv_id AND a.ent < b.ent GROUP BY a.ent, b.ent) "
    "SELECT ea AS ent_a, eb AS ent_b, CAST(cab AS BIGINT) AS n_co, "
    "printf('%.6f', ROUND((CAST(cab AS DOUBLE) * (SELECT n_convs FROM n)) "
    " / (CAST(x.c AS DOUBLE) * CAST(y.c AS DOUBLE)), 6)) AS lift "
    "FROM pairs JOIN ca x ON x.ent = ea JOIN ca y ON y.ent = eb",
)
def kg_cooccur_lift(spark, sf):
    """Entity-pair association over conversations: co-occurrence counts
    and lift = P(a,b) / (P(a)·P(b)) with probabilities over conversations
    (lift > 1 ⇔ positive PMI; the ratio is emitted instead of its log so
    both engines produce bit-identical doubles — IEEE ·/÷ are exactly
    rounded everywhere, libm log is not).

    Scale shape: the per-conversation entity set is bounded by the
    linking dictionary, so the self-join emits at most |dict|² pairs per
    conversation, keyed conv_id-first (co-partitioned with the triple
    table). The global rollups land on the tiny entity/pair domain —
    virtually all reduction happens in map-side partial aggregation, and
    the final joins against the per-entity counts broadcast. The corpus
    total rides along as a broadcast 1-row crossJoin, not a driver
    action."""
    t = _triples_table(spark, sf)
    ec = (
        t.select("conv_id", F.col("subj").alias("ent"))
        .unionByName(t.select("conv_id", F.col("obj").alias("ent")))
        .distinct()
    )
    n = ec.agg(F.countDistinct("conv_id").cast("double").alias("n_convs"))
    ca = ec.groupBy("ent").agg(F.count(F.lit(1)).alias("c"))
    a = ec.select("conv_id", F.col("ent").alias("ea"))
    b = ec.select("conv_id", F.col("ent").alias("eb"))
    pairs = (
        a.join(b, "conv_id")
        .filter(F.col("ea") < F.col("eb"))
        .groupBy("ea", "eb")
        .agg(F.count(F.lit(1)).alias("cab"))
    )
    return (
        pairs.join(F.broadcast(ca.withColumnRenamed("ent", "ea").withColumnRenamed("c", "cx")), "ea")
        .join(F.broadcast(ca.withColumnRenamed("ent", "eb").withColumnRenamed("c", "cy")), "eb")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("ea").alias("ent_a"),
            F.col("eb").alias("ent_b"),
            F.col("cab").cast("long").alias("n_co"),
            # ROUND before formatting — printf ties diverge between the
            # engines on dyadic ratios, ROUND(x, 6) does not (see
            # quality_repetition)
            F.format_string(
                "%.6f",
                F.round(
                    (F.col("cab").cast("double") * F.col("n_convs"))
                    / (F.col("cx").cast("double") * F.col("cy").cast("double")),
                    6,
                ),
            ).alias("lift"),
        )
    )


@register(
    "kg_triangles",
    f"WITH t AS ({_TRIPLES_SQL}), e AS ({_EDGES_ORIENTED_SQL}) "
    f"SELECT conv_id, CAST(n AS BIGINT) AS n_triangles FROM ({_TRIANGLES_SQL}) tri",
)
def kg_triangles(spark, sf):
    """Per-conversation triangle count over the undirected entity graph —
    the standard clustering/cohesion statistic (how clique-ish each
    conversation's entity neighbourhood is). Canonical edge orientation
    (a < b) means each triangle x<y<z is counted exactly once as
    e1=(x,y), e2=(x,z), e3=(y,z).

    Scale shape: symmetrize/orient + distinct first, so the join input is
    the DISTINCT edge set, bounded per conversation by |dict|² — the same
    pre-aggregation discipline that fixed kg_two_hop's quadratic blowup.
    All three self-join shuffles key conv_id-first (co-partitioned with
    the triple table's bucketing); nothing ever crosses conversations."""
    e = _oriented_edges(_triples_table(spark, sf))
    return _conv_triangles(e).select(
        "conv_id", F.col("n").alias("n_triangles")
    )


@register(
    "kg_temporal_span",
    f"SELECT subj, pred, obj, CAST(MIN(window_start) AS INT) AS first_w, "
    "CAST(MAX(window_start) AS INT) AS last_w, "
    "CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs, "
    "CAST(COUNT(*) AS BIGINT) AS n_occ "
    f"FROM ({_TRIPLES_SQL}) tr GROUP BY subj, pred, obj",
)
def kg_temporal_span(spark, sf):
    """Temporal rollup per distinct (subj, pred, obj) fact: first/last
    turn-window it was observed in, conversation spread, occurrence
    count — the 'when did the KG learn this, is it still asserted'
    query temporal knowledge graphs answer. The grouping domain is
    entity² × the small predicate vocabulary, so virtually all reduction
    happens map-side in partial aggregation and the final exchange
    carries one row per (partition, fact); reads the materialized triple
    table like every consumption key."""
    return (
        _triples_table(spark, sf)
        .groupBy("subj", "pred", "obj")
        .agg(
            F.min("window_start").cast("int").alias("first_w"),
            F.max("window_start").cast("int").alias("last_w"),
            F.countDistinct("conv_id").alias("n_convs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
    )


@register(
    "kg_entity_cards",
    # Per-entity profile card: both participation directions unioned,
    # one entity-keyed aggregate + the deterministic top-predicate mode
    # (count DESC, pred ASC — the agg_mode tie contract).
    f"WITH t AS ({_TRIPLES_SQL}), "
    "e AS (SELECT conv_id, window_start, subj AS entity, pred, obj AS other,"
    " 'out' AS dir FROM t "
    " UNION ALL SELECT conv_id, window_start, obj, pred, subj, 'in' FROM t), "
    "prof AS (SELECT entity, CAST(COUNT(*) AS BIGINT) AS n_triples, "
    " CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs, "
    " CAST(COUNT(DISTINCT CASE WHEN dir = 'out' THEN other END) AS BIGINT)"
    "  AS n_out_nbrs, "
    " CAST(COUNT(DISTINCT CASE WHEN dir = 'in' THEN other END) AS BIGINT)"
    "  AS n_in_nbrs, "
    " CAST(MIN(window_start) AS INT) AS first_w, "
    " CAST(MAX(window_start) AS INT) AS last_w "
    " FROM e GROUP BY entity), "
    "pc AS (SELECT entity, pred, COUNT(*) AS n FROM e GROUP BY entity, pred), "
    "pm AS (SELECT entity, pred AS top_pred, ROW_NUMBER() OVER ("
    " PARTITION BY entity ORDER BY n DESC, pred) AS rn FROM pc) "
    "SELECT p.entity, p.n_triples, p.n_convs, p.n_out_nbrs, p.n_in_nbrs, "
    "p.first_w, p.last_w, pm.top_pred "
    "FROM prof p JOIN pm ON pm.entity = p.entity AND pm.rn = 1",
)
def kg_entity_cards(spark, sf):
    """Entity profile cards — the 'entity page' rollup a KG serving layer
    precomputes per node: triple participation count, conversation
    spread, distinct out-/in-neighbour counts, first/last observation
    window, and the entity's dominant predicate (deterministic mode:
    count DESC, pred ASC).

    Scale shape: the symmetrized participation view is derived once and
    feeds two entity-keyed aggregates that reuse ONE hash partitioning;
    the top-predicate window runs over the entity × predicate-vocabulary
    count table (dimension-sized), and the final join is entity-keyed
    against that tiny side (AQE broadcasts it). Nothing shuffles the
    fact-scale view twice."""
    t = _triples_table(spark, sf)
    e = t.select(
        "conv_id",
        "window_start",
        F.col("subj").alias("entity"),
        "pred",
        F.col("obj").alias("other"),
        F.lit("out").alias("dir"),
    ).unionByName(
        t.select(
            "conv_id",
            "window_start",
            F.col("obj").alias("entity"),
            "pred",
            F.col("subj").alias("other"),
            F.lit("in").alias("dir"),
        )
    )
    prof = e.groupBy("entity").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.countDistinct(
            F.when(F.col("dir") == "out", F.col("other"))
        ).alias("n_out_nbrs"),
        F.countDistinct(
            F.when(F.col("dir") == "in", F.col("other"))
        ).alias("n_in_nbrs"),
        F.min("window_start").cast("int").alias("first_w"),
        F.max("window_start").cast("int").alias("last_w"),
    )
    pc = e.groupBy("entity", "pred").agg(F.count(F.lit(1)).alias("n"))
    wm = Window.partitionBy("entity").orderBy(F.col("n").desc(), F.col("pred"))
    pm = (
        pc.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") == 1)
        .select("entity", F.col("pred").alias("top_pred"))
    )
    return prof.join(pm, "entity").select(
        "entity",
        "n_triples",
        "n_convs",
        "n_out_nbrs",
        "n_in_nbrs",
        "first_w",
        "last_w",
        "top_pred",
    )


@register(
    "kg_clustering",
    f"WITH t AS ({_TRIPLES_SQL}), e AS ({_EDGES_ORIENTED_SQL}), "
    "deg AS (SELECT conv_id, node, COUNT(*) AS d FROM ("
    " SELECT conv_id, a AS node FROM e UNION ALL SELECT conv_id, b FROM e) "
    " GROUP BY conv_id, node), "
    "w AS (SELECT conv_id, CAST(SUM(d * (d - 1)) / 2 AS BIGINT) AS n_wedges "
    " FROM deg GROUP BY conv_id), "
    f"tri AS ({_TRIANGLES_SQL}) "
    "SELECT w.conv_id, CAST(COALESCE(tri.n, 0) AS BIGINT) AS n_triangles, "
    "n_wedges, printf('%.6f', ROUND((3.0 * CAST(COALESCE(tri.n, 0) AS DOUBLE)) "
    " / CAST(GREATEST(n_wedges, 1) AS DOUBLE), 6)) AS clustering_coeff "
    "FROM w LEFT JOIN tri ON tri.conv_id = w.conv_id",
)
def kg_clustering(spark, sf):
    """Per-conversation global clustering coefficient — 3·triangles /
    wedges over the undirected entity graph (wedge = open or closed
    2-path, Σ_v d(v)·(d(v)−1)/2). With ``kg_triangles`` this is the
    standard graph-cohesion pair: how much of each conversation's entity
    neighbourhood actually closes into cliques.

    Scale shape: degree and wedge counts come from ONE pass over the
    distinct oriented edge set (the same pre-aggregated relation the
    triangle join uses), keyed conv_id-first throughout; the triangle arm
    is kg_triangles' bounded self-join. The division is exact both
    engines (d·(d−1) is always even; doubles below 2^53), the
    coefficient a formatted string per the float rule."""
    e = _oriented_edges(_triples_table(spark, sf))
    deg = (
        e.select("conv_id", F.col("a").alias("node"))
        .unionByName(e.select("conv_id", F.col("b").alias("node")))
        .groupBy("conv_id", "node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wedges = deg.groupBy("conv_id").agg(
        (F.sum(F.col("d") * (F.col("d") - 1)) / F.lit(2))
        .cast("long")
        .alias("n_wedges")
    )
    tri = _conv_triangles(e)
    return (
        wedges.join(tri, "conv_id", "left")
        .select(
            "conv_id",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_triangles"),
            "n_wedges",
            # ROUND before formatting — see quality_repetition's tie note
            F.format_string(
                "%.6f",
                F.round(
                    (F.lit(3.0) * F.coalesce("n", F.lit(0)).cast("double"))
                    / F.greatest("n_wedges", F.lit(1)).cast("double"),
                    6,
                ),
            ).alias("clustering_coeff"),
        )
    )


_LPA_ITERS = 4  # fixed synchronous label-propagation rounds


@register("kg_communities", None)  # == pandas twin, pytest-pinned (lpa_pandas)
def kg_communities(spark, sf, iters: int = _LPA_ITERS):
    """Community detection per conversation via synchronous label
    propagation (Raghavan et al. 2007) over the undirected entity graph:
    every node starts labelled with itself; each round it adopts the
    most frequent label among its neighbours, ties broken by the
    lexicographically smallest label — fully deterministic (the
    classic asynchronous/random-order LPA is not; this spelling trades
    a little convergence speed for run-to-run stability, the repo's
    determinism rule). Fixed ``iters`` rounds ⇒ zero in-loop driver
    barriers, ``localCheckpoint`` per round cuts lineage — the same
    iterative-join discipline as kg_pagerank and kg_reach.

    Scale shape: each round is one join of the label table against the
    edge list plus one (conv_id, node, label) count aggregation and one
    per-node argmax window — every shuffle keys conv_id-first, bounded
    by the per-conversation entity domain, never by turns."""
    e = _sym_edges(_triples_table(spark, sf))
    lab = (
        e.select("conv_id", F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(iters):
        # neighbour labels of s = labels joined on the o endpoint;
        # rename the label side first (lab derives from e — same
        # attribute-ambiguity trap as kg_reach's frontier)
        lb = lab.select(
            F.col("conv_id").alias("l_conv"),
            F.col("node").alias("l_node"),
            "label",
        )
        nbr = e.join(
            lb, (F.col("conv_id") == F.col("l_conv")) & (F.col("o") == F.col("l_node"))
        ).select("conv_id", F.col("s").alias("node"), "label")
        counts = nbr.groupBy("conv_id", "node", "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        w = Window.partitionBy("conv_id", "node").orderBy(
            F.desc("c"), F.asc("label")
        )
        lab = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("conv_id", "node", "label")
            .localCheckpoint()
        )
    return lab.select("conv_id", "node", F.col("label").alias("community"))


def lpa_pandas(edges: pd.DataFrame, iters: int = _LPA_ITERS) -> pd.DataFrame:
    """Single-process twin of ``kg_communities`` for the golden test:
    ``edges`` has columns (conv_id, subj, obj); returns
    (conv_id, node, community) under the same synchronous min-label
    tie-break semantics."""
    from collections import Counter, defaultdict

    out_conv, out_node, out_comm = [], [], []
    e = edges[edges["subj"] != edges["obj"]]
    for conv, grp in e.groupby("conv_id"):
        adj = defaultdict(set)
        for s, o in zip(grp["subj"], grp["obj"]):
            adj[s].add(o)
            adj[o].add(s)
        lab = {v: v for v in adj}
        for _ in range(iters):
            new = {}
            for v, nbrs in adj.items():
                cnt = Counter(lab[u] for u in nbrs)
                top = max(cnt.values())
                new[v] = min(l for l, c in cnt.items() if c == top)
            lab = new
        for v in sorted(adj):
            out_conv.append(conv)
            out_node.append(v)
            out_comm.append(lab[v])
    return pd.DataFrame(
        {"conv_id": out_conv, "node": out_node, "community": out_comm}
    )


# BFS depth cap: the entity domain is the linking dictionary, so no
# shortest path can exceed |dict| - 1 hops; both engines bound at 7.
_REACH_MAX_HOPS = 7


@register(
    "kg_reach",
    # DuckDB evaluates the BFS as a recursive CTE (UNION dedups states so
    # cycles terminate); Spark spells the same fixpoint as bounded
    # iterative joins below. MIN(d) per node = hop distance.
    f"WITH RECURSIVE t AS ({_TRIPLES_SQL}), e AS ({_EDGES_SYM_SQL}), "
    "seed AS (SELECT conv_id, MIN(s) AS node FROM e GROUP BY conv_id), "
    "r(conv_id, node, d) AS ("
    " SELECT conv_id, node, 0 FROM seed "
    " UNION "
    " SELECT e.conv_id, e.o, r.d + 1 FROM r JOIN e "
    f"  ON e.conv_id = r.conv_id AND e.s = r.node WHERE r.d < {_REACH_MAX_HOPS}) "
    "SELECT conv_id, node, CAST(MIN(d) AS INT) AS dist FROM r "
    "GROUP BY conv_id, node",
)
def kg_reach(spark, sf):
    """Per-conversation BFS hop distances from each conversation's seed
    entity (its lexicographically-smallest one) over the undirected
    entity graph — the reachability primitive under 'how is X connected
    to Y' KG queries. The oracle is a genuine recursive CTE; this side is
    the distributed spelling of the same fixpoint: frontier-expand,
    anti-join against settled nodes, repeat.

    Scale shape: fixed ``_REACH_MAX_HOPS`` iterations (the dictionary
    bounds any shortest path), so there are ZERO in-loop driver barriers
    — the same discipline as kg_pagerank; ``localCheckpoint`` per round
    cuts the growing lineage. Every join keys conv_id-first, so each
    round is a co-partitioned exchange bounded by the per-conversation
    entity domain, never by turns."""
    e = _sym_edges(_triples_table(spark, sf))
    dist = (
        e.groupBy("conv_id")
        .agg(F.min("s").alias("node"))
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    frontier = dist
    for d in range(1, _REACH_MAX_HOPS + 1):
        # frontier derives from e, so rename its columns before the join
        # to keep attribute resolution unambiguous across iterations
        fr = frontier.select(
            F.col("conv_id").alias("f_conv"), F.col("node").alias("f_node")
        )
        reached = fr.join(
            e, (F.col("f_conv") == F.col("conv_id")) & (F.col("f_node") == F.col("s"))
        ).select("conv_id", F.col("o").alias("node"))
        fresh = (
            reached.distinct()
            .join(dist.select("conv_id", "node"), ["conv_id", "node"], "left_anti")
            .withColumn("dist", F.lit(d))
            .localCheckpoint()
        )
        dist = dist.unionByName(fresh)
        frontier = fresh
    return dist.select("conv_id", "node", F.col("dist").cast("int").alias("dist"))


_KCORE_K = 2  # the 2-core: nodes in at least one cycle of their component
# Peel-round bound: each round at fixpoint is a no-op, and the entity
# domain is the linking dictionary, so |PIPE_DICT| rounds always reach the
# fixpoint (worst case removes one node per round per conversation).
_KCORE_ROUNDS = len(PIPE_DICT)


@register("kg_kcore", None)  # == pandas peel twin, pytest-pinned (kcore_pandas)
def kg_kcore(spark, sf, k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS):
    """Per-conversation k-core membership (Seidman 1983) over the
    undirected entity graph: iteratively peel nodes of degree < k until
    the fixpoint; what survives is the maximal subgraph of minimum degree
    k — the dense 'kernel' of each conversation's entity neighbourhood,
    the standard precursor to community/cohesion analysis (a node outside
    the 2-core hangs off the graph by a tree and closes no cycles).

    Scale shape: at most ``rounds`` iterations (the dictionary bounds the
    per-conversation node count, so the bound always suffices), with an
    early exit at the true fixpoint: peeling only ever REMOVES edges, so
    an unchanged edge count between rounds proves the next round is a
    no-op. The probe count is over the just-``localCheckpoint``-ed
    (eager ⇒ already materialized) edge set, which is bounded by convs ×
    entity-domain² — dimension-scale, never turns — so the barrier costs
    microseconds while saving whole peel rounds (measured 2.7 → 1.3 s at
    sf0.1: this corpus's graphs reach the fixpoint in 2 rounds, the
    worst-case bound is 8). Each round is one (conv_id, node) degree
    aggregation over the surviving distinct edge set plus two semi-joins
    that drop edges incident to peeled nodes; every shuffle keys
    conv_id-first (co-partitioned with the triple table's bucketing).
    ``localCheckpoint`` per round cuts the growing lineage."""
    e = _sym_edges(_triples_table(spark, sf)).localCheckpoint()
    n_edges = e.count()
    for _ in range(rounds):
        # sym edges carry each undirected edge in both directions, so
        # degree(node) = #rows with s = node (distinct neighbours)
        keep = (
            e.groupBy("conv_id", "s")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= k)
            .select(
                F.col("conv_id").alias("k_conv"), F.col("s").alias("k_node")
            )
        )
        e = (
            e.join(
                keep,
                (F.col("conv_id") == F.col("k_conv"))
                & (F.col("s") == F.col("k_node")),
                "left_semi",
            )
            .join(
                keep,
                (F.col("conv_id") == F.col("k_conv"))
                & (F.col("o") == F.col("k_node")),
                "left_semi",
            )
            .localCheckpoint()
        )
        n_next = e.count()
        if n_next == n_edges:  # no edge dropped ⇒ fixpoint reached
            break
        n_edges = n_next
    return e.select("conv_id", F.col("s").alias("node")).distinct()


def kcore_pandas(edges: pd.DataFrame, k: int = _KCORE_K) -> pd.DataFrame:
    """Single-process twin of ``kg_kcore`` for the golden test: ``edges``
    has columns (conv_id, subj, obj); peels to the true fixpoint (no
    round bound needed off-cluster) and returns (conv_id, node) sorted."""
    from collections import defaultdict

    out_conv, out_node = [], []
    e = edges[edges["subj"] != edges["obj"]]
    for conv, grp in e.groupby("conv_id"):
        adj: dict = defaultdict(set)
        for s, o in zip(grp["subj"], grp["obj"]):
            adj[s].add(o)
            adj[o].add(s)
        while True:
            peel = [v for v, nbrs in adj.items() if len(nbrs) < k]
            if not peel:
                break
            for v in peel:
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
        for v in sorted(adj):
            out_conv.append(conv)
            out_node.append(v)
    return pd.DataFrame({"conv_id": out_conv, "node": out_node})


@register(
    "kg_pred_conflicts",
    f"WITH t AS ({_TRIPLES_SQL}) "
    "SELECT conv_id, subj, pred, "
    "CAST(COUNT(DISTINCT obj) AS BIGINT) AS n_objs, "
    "MIN(obj) AS first_obj, MAX(obj) AS last_obj "
    "FROM t GROUP BY conv_id, subj, pred "
    "HAVING COUNT(DISTINCT obj) > 1",
)
def kg_pred_conflicts(spark, sf):
    """Functional-dependency audit over the graph: (conv_id, subj, pred)
    groups asserting MORE than one object — the standard KG quality check
    for predicates expected to be functional (a subject 'answered_with'
    two different canonicals in one conversation is either a genuine
    multi-valued fact or an extraction error; the audit surfaces both for
    review, with the min/max objects as witnesses).

    Scale shape: one hash aggregation over the materialized triple table,
    keyed conv_id-first (co-partitioned with the table's bucketing, so
    the groupBy is map-side-heavy); COUNT(DISTINCT obj) is bounded by the
    entity domain per group. No joins, no windows."""
    return (
        _triples_table(spark, sf)
        .groupBy("conv_id", "subj", "pred")
        .agg(
            F.countDistinct("obj").alias("n_objs"),
            F.min("obj").alias("first_obj"),
            F.max("obj").alias("last_obj"),
        )
        .filter(F.col("n_objs") > 1)
    )


@register(
    "kg_export_nquads",
    f"WITH t AS ({_TRIPLES_SQL}) "
    "SELECT '<urn:rbs:e:' || subj || '> <urn:rbs:p:' || pred || '> "
    "<urn:rbs:e:' || obj || '> <urn:rbs:g:' || conv_id || '/' "
    " || CAST(window_start AS VARCHAR) || '> .' AS nquad FROM t",
)
def kg_export_nquads(spark, sf):
    """N-Quads serialization of the graph (W3C RDF 1.1 N-Quads line
    format) — the interop surface a KG engine needs so downstream RDF
    stores / SPARQL engines can load the extracted graph directly; the
    graph label carries (conv_id, window_start) so each quad stays
    traceable to its provenance window. Entities/predicates here are
    single lowercase tokens, so no percent-escaping is needed inside the
    URNs (asserted by the dictionary's charset).

    Scale shape: a pure projection over the materialized triple table —
    zero shuffles, pipelines with the table's bucketing; writing the
    lines out is ``sink``-shaped (text sink partitioned by conv bucket)."""
    t = _triples_table(spark, sf)
    return t.select(
        F.concat(
            F.lit("<urn:rbs:e:"), "subj",
            F.lit("> <urn:rbs:p:"), "pred",
            F.lit("> <urn:rbs:e:"), "obj",
            F.lit("> <urn:rbs:g:"), "conv_id",
            F.lit("/"), F.col("window_start").cast("string"),
            F.lit("> ."),
        ).alias("nquad")
    )


@register(
    "kg_adjacency",
    f"WITH t AS ({_TRIPLES_SQL}), e AS ({_EDGES_SYM_SQL}) "
    "SELECT conv_id, s AS node, CAST(COUNT(*) AS BIGINT) AS degree, "
    "array_to_string(list(o ORDER BY o), ' ') AS neighbors "
    "FROM e GROUP BY conv_id, s",
)
def kg_adjacency(spark, sf):
    """Adjacency-list export: per (conv_id, node), the degree and the
    sorted neighbour list over the undirected distinct edge set — the
    input format of GNN samplers and external graph engines (one line
    per node beats one line per edge for neighbourhood-local consumers).
    Neighbour lists are space-joined sorted strings so the output is
    deterministic and engine-comparable.

    Scale shape: one conv_id-first aggregation over the symmetrized
    distinct edge set; list width is bounded by the per-conversation
    entity domain (the linking dictionary), never by turns."""
    e = _sym_edges(_triples_table(spark, sf))
    return e.groupBy("conv_id", F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("degree"),
        F.array_join(F.array_sort(F.collect_list("o")), " ").alias("neighbors"),
    )


# GraphSAGE-style sampler fan-out: neighbours kept per node per layer.
KG_SAMPLE_K = 3


@register(
    "kg_sample_neighbors",
    f"WITH t AS ({_TRIPLES_SQL}), e AS ({_EDGES_SYM_SQL}) "
    "SELECT conv_id, node, nb, CAST(rnk AS BIGINT) AS rnk FROM ("
    " SELECT conv_id, s AS node, o AS nb, ROW_NUMBER() OVER ("
    "  PARTITION BY conv_id, s "
    "  ORDER BY MD5(conv_id || '|' || s || '|' || o), o) AS rnk FROM e) r "
    f"WHERE rnk <= {KG_SAMPLE_K}",
)
def kg_sample_neighbors(spark, sf):
    """Deterministic neighbour sampling — the GraphSAGE/GNN mini-batch
    sampler's per-layer step: keep at most ``KG_SAMPLE_K`` neighbours per
    (conv_id, node), chosen by MD5 rank over (conv, node, neighbour) so
    the sample is a pure function of the graph (same neighbours every
    engine, every run, every repartition — the property an RNG sampler
    loses and hash sampling exists to provide; re-keying the hash gives
    a fresh independent sample per training epoch).

    Scale shape: ONE window keyed (conv_id, node) over the symmetrized
    distinct edge set — the same exchange ``kg_adjacency`` pays; no
    global sort, no driver materialization. At 100 TB this runs once per
    sampling epoch and its output IS the GNN dataloader's edge list."""
    e = _sym_edges(_triples_table(spark, sf))
    h = F.md5(F.concat_ws("|", "conv_id", "s", "o"))
    w = Window.partitionBy("conv_id", "s").orderBy(h, "o")
    return (
        e.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= KG_SAMPLE_K)
        .select(
            "conv_id", F.col("s").alias("node"), F.col("o").alias("nb"), "rnk"
        )
    )


@register(
    "kg_neighbor_jaccard",
    f"WITH t AS ({_TRIPLES_SQL}), e AS ({_EDGES_SYM_SQL}), "
    "deg AS (SELECT conv_id, s AS node, COUNT(*) AS d FROM e "
    " GROUP BY conv_id, s), "
    "cm AS (SELECT a.conv_id, a.s AS ea, b.s AS eb, COUNT(*) AS c FROM e a "
    " JOIN e b ON b.conv_id = a.conv_id AND b.o = a.o AND a.s < b.s "
    " GROUP BY a.conv_id, a.s, b.s) "
    "SELECT cm.conv_id, cm.ea AS ent_a, cm.eb AS ent_b, "
    "CAST(c AS BIGINT) AS n_common, "
    "printf('%.6f', ROUND(CAST(c AS DOUBLE) / (da.d + db.d - c), 6)) "
    " AS jaccard "
    "FROM cm JOIN deg da ON da.conv_id = cm.conv_id AND da.node = cm.ea "
    "JOIN deg db ON db.conv_id = cm.conv_id AND db.node = cm.eb",
)
def kg_neighbor_jaccard(spark, sf):
    """Link prediction over the KG: neighbourhood Jaccard for every
    entity pair sharing at least one neighbour within a conversation
    (Liben-Nowell/Kleinberg common-neighbour similarity over the
    symmetrized distinct edge set). The classic "suggest a missing edge"
    primitive a KG consumer runs after construction; counts are exact
    integers, the ratio is ONE correctly-rounded IEEE division, emitted
    %.6f per the float rule.

    Scale shape: the same pre-aggregation discipline as ``kg_two_hop`` —
    pairs are generated by joining the distinct symmetrized edge set to
    itself on (conv_id, shared-neighbour), so the join is bounded by
    convs x entity-domain^2, never by turns or raw triples; degrees join
    back on (conv_id, node). Every shuffle keys conv_id-first, reusing
    the materialized triple table's conversation co-partitioning."""
    e = _sym_edges(_triples_table(spark, sf))
    deg = e.groupBy("conv_id", F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    b_side = e.select("conv_id", F.col("s").alias("eb"), "o")
    cm = (
        e.select("conv_id", F.col("s").alias("ea"), "o")
        .join(b_side, ["conv_id", "o"])
        .filter(F.col("ea") < F.col("eb"))
        .groupBy("conv_id", "ea", "eb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    da = deg.select(
        "conv_id", F.col("node").alias("ea"), F.col("d").alias("da_d")
    )
    db = deg.select(
        "conv_id", F.col("node").alias("eb"), F.col("d").alias("db_d")
    )
    return (
        cm.join(da, ["conv_id", "ea"])
        .join(db, ["conv_id", "eb"])
        .select(
            "conv_id",
            F.col("ea").alias("ent_a"),
            F.col("eb").alias("ent_b"),
            F.col("c").cast("long").alias("n_common"),
            F.format_string(
                "%.6f",
                F.round(
                    F.col("c").cast("double")
                    / (F.col("da_d") + F.col("db_d") - F.col("c")),
                    6,
                ),
            ).alias("jaccard"),
        )
    )


@register("sink_nquads_text", None)  # rows-only; pytest: == kg_export_nquads
def sink_nquads_text(spark, sf):
    """Land the N-Quads export on disk as line-oriented ``.nq`` text
    files partitioned by a 16-way conv-hash bucket — the physical shape
    an external RDF store bulk-loads (one directory per bucket, plain
    text lines). Returns the read-back so the sink round-trip is under
    the rows-only gate; pytest pins read-back set == kg_export_nquads.

    Scale shape: the export is a zero-shuffle projection; the single
    repartition keys on the write bucket (Iceberg
    write.distribution-mode=hash twin, same discipline as
    write_graph_table) so each of the 16 partition dirs is written by
    one task — bounded file counts at any input scale."""
    import os
    import tempfile

    from ..tmputil import sweep_dead_dirs

    prefix = os.path.join(tempfile.gettempdir(), "rbs_sink_nq_p")
    sweep_dead_dirs(prefix, keep_own=False)
    out = f"{prefix}{os.getpid()}"
    nq = kg_export_nquads(spark, sf)
    bucketed = nq.withColumn(
        "bucket", F.pmod(F.crc32(F.col("nquad")), F.lit(16)).cast("int")
    )
    (
        bucketed.repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .text(out)
    )
    # partition discovery re-adds the bucket column on read; project it
    # away so the round-trip schema equals the export's
    return (
        spark.read.text(out)
        .select(F.col("value").alias("nquad"))
        .localCheckpoint()
    )


_WALK_STEPS = 3       # emitted walks are 4 nodes long
_WALKS_PER_NODE = 2


def _walk_step_sql(t: int) -> str:
    """One unrolled walk step: pick the neighbour minimizing the MD5 of
    (conv, walk, step, neighbour) — MIN over 32-hex-char-prefixed strings,
    so the comparison is decided by the hash and the chosen node is read
    back from offset 35 (32 hash chars + '::')."""
    return (
        f"w{t} AS (SELECT conv_id, start, walk_id, cur, "
        "path || ' ' || cur AS path FROM ("
        " SELECT w.conv_id, w.start, w.walk_id, w.path,"
        " SUBSTRING(MIN(MD5(CONCAT_WS('|', w.conv_id,"
        f" CAST(w.walk_id AS VARCHAR), '{t}', e.o)) || '::' || e.o), 35) AS cur"
        f" FROM w{t - 1} w JOIN e"
        " ON e.conv_id = w.conv_id AND e.s = w.cur"
        " GROUP BY w.conv_id, w.start, w.walk_id, w.path))"
    )


@register(
    "kg_random_walks",
    f"WITH t AS ({_TRIPLES_SQL}), e AS ({_EDGES_SYM_SQL}), "
    "w0 AS (SELECT DISTINCT e.conv_id, e.s AS start, wi.walk_id, "
    " e.s AS cur, e.s AS path FROM e CROSS JOIN "
    " (SELECT 0 AS walk_id UNION ALL SELECT 1) wi), "
    + ", ".join(_walk_step_sql(t) for t in range(1, _WALK_STEPS + 1))
    + " SELECT conv_id, start, CAST(walk_id AS BIGINT) AS walk_id, "
    f"path AS walk FROM w{_WALK_STEPS}",
)
def kg_random_walks(spark, sf):
    """DeepWalk-style random-walk corpus over the entity graph (Perozzi et
    al. 2014): ``_WALKS_PER_NODE`` fixed-length walks from every node of
    every conversation's undirected entity graph — the sentence corpus
    graph-embedding trainers (word2vec over walks) consume. The 'random'
    transition is DERANDOMIZED per house rule (no rand()/wall-clock in
    data paths): each step moves to the neighbour minimizing
    ``MD5(conv|walk_id|step|neighbour)``, so the walk is a pure function
    of (graph, start, walk_id) — reproducible across engines, runs, and
    partitionings, yet hash-scrambled enough that the two walks per node
    diverge and step choices decorrelate across steps. The oracle unrolls
    the identical hash-argmin as grouped MIN over 32-hex-prefixed strings.

    Scale shape: the adjacency table (conv_id, node, neighbour array) is
    built ONCE (one aggregation keyed conv_id-first, dimension-sized:
    convs × entity domain) and ``localCheckpoint``-ed; each of the
    ``_WALK_STEPS`` fixed iterations is ONE co-partitioned equi-join of
    the walk-state table against it with the neighbour choice as pure
    array algebra (no per-step aggregation shuffle — the grouped MIN of
    the oracle collapses into ``array_min`` over the pre-collected
    neighbour list). Zero in-loop driver barriers, same discipline as
    kg_reach/kg_pagerank; walk-state rows = nodes × walks, bounded by the
    entity domain, never by turns."""
    e = _sym_edges(_triples_table(spark, sf))
    adj = (
        e.groupBy("conv_id", F.col("s").alias("anode"))
        .agg(F.collect_list("o").alias("nbrs"))
        .localCheckpoint()
    )
    state = (
        e.select("conv_id", F.col("s").alias("start"))
        .distinct()
        .select(
            "conv_id",
            "start",
            F.explode(
                F.array(*[F.lit(i) for i in range(_WALKS_PER_NODE)])
            ).alias("walk_id"),
        )
        .withColumn("cur", F.col("start"))
        .withColumn("path", F.col("start"))
    )
    for t in range(1, _WALK_STEPS + 1):
        # state derives from e (as adj does) — rename before the join so
        # attribute resolution stays unambiguous across iterations
        st = state.select(
            F.col("conv_id").alias("w_conv"), "start", "walk_id", "cur", "path"
        )
        joined = st.join(
            adj,
            (F.col("w_conv") == F.col("conv_id"))
            & (F.col("cur") == F.col("anode")),
        )
        # NB: the HOF lambda must take exactly ONE parameter — a default
        # arg (lambda n, t=t) makes PySpark treat it as the binary
        # (element, index) form and bind t to the array INDEX column.
        # Close over a pre-built literal instead.
        step_lit = F.lit(str(t))
        tag = F.transform(
            "nbrs",
            lambda n: F.concat(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("w_conv"),
                        F.col("walk_id").cast("string"),
                        step_lit,
                        n,
                    )
                ),
                F.lit("::"),
                n,
            ),
        )
        nxt = F.substring(F.array_min(tag), 35, 1 << 30)
        state = joined.select(
            F.col("w_conv").alias("conv_id"),
            "start",
            "walk_id",
            nxt.alias("cur"),
            F.concat_ws(" ", "path", nxt).alias("path"),
        )
    return state.select(
        "conv_id",
        "start",
        F.col("walk_id").cast("long").alias("walk_id"),
        F.col("path").alias("walk"),
    )


# ------------------------------------------------------------------- G5 ----

@register(
    "join_skew_salted",
    # the salted two-phase join must produce EXACTLY the plain join's result
    "SELECT l_orderkey, l_linenumber, o_orderstatus FROM lineitem "
    "JOIN orders ON l_orderkey = o_orderkey",
)
def join_skew_salted(spark, sf):
    from ..caching import cached_scan

    li = cached_scan(spark, f"{sf}/lineitem.parquet")
    o = cached_scan(spark, f"{sf}/orders.parquet")
    n_salt = 8
    # deterministic salt on the big/skewed side; replicate the small side
    salted_li = li.withColumn(
        "salt", F.pmod(F.hash("l_orderkey", "l_linenumber", "l_quantity"), F.lit(n_salt))
    )
    replicated_o = o.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return salted_li.join(
        replicated_o,
        (salted_li["l_orderkey"] == replicated_o["o_orderkey"])
        & (salted_li["salt"] == replicated_o["salt"]),
    ).select("l_orderkey", "l_linenumber", "o_orderstatus")


# -------------------------------------------------------------- G1 (∅) ----

@register("minhash_bands", None)  # deterministic hashes: golden-checked in pytest
def minhash_bands(spark, sf):
    from ..operators.linking import surface_bands

    d = _docs(spark, sf).select(
        F.lower(F.substring("text", 1, 40)).alias("surface_key")
    )
    return surface_bands(d)


@register("lsh_candidate_pairs", None)  # verified in pytest vs exhaustive Jaccard
def lsh_candidate_pairs(spark, sf):
    from ..operators.linking import surface_bands

    d = _docs(spark, sf).select(
        "doc_id", F.lower(F.substring("text", 1, 40)).alias("surface_key")
    )
    bands = surface_bands(d)
    withid = bands.join(d, "surface_key")
    a = withid.select(
        F.col("doc_id").alias("a"), "band_idx", "band_hash"
    )
    b = withid.select(
        F.col("doc_id").alias("b"), "band_idx", "band_hash"
    )
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


# ------------------------------------------------------------- §2.5 UDFs ----

@register(
    "udf_scalar_pandas",
    "SELECT doc_id, REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE("
    "source, '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'), '[0-9]', '0', 'g') "
    "AS src_shape FROM documents",
)
def udf_scalar_pandas(spark, sf):
    from ..operators.features import word_shape

    @F.pandas_udf("string")
    def shape_udf(s: pd.Series) -> pd.Series:
        return pd.Series(word_shape(s.to_numpy()), dtype="object")

    d = _docs(spark, sf)
    return d.select("doc_id", shape_udf("source").alias("src_shape"))


@register(
    "udf_grouped_agg",
    "SELECT source, ROUND(CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE)"
    " / COUNT(*), 6) AS mean_chars FROM documents GROUP BY source",
)
def udf_grouped_agg(spark, sf):
    @F.pandas_udf("double")
    def mean_chars(v: pd.Series) -> float:
        # decimal-free but order-stable: sum of int64 is exact
        return float(v.sum()) / len(v)

    d = _docs(spark, sf)
    return d.groupBy("source").agg(
        F.round(mean_chars("n_chars"), 6).alias("mean_chars")
    )


@register(
    "udf_grouped_map",
    "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(n_chars) AS BIGINT) AS total_chars FROM documents GROUP BY source",
)
def udf_grouped_map(spark, sf):
    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n_docs": np.array([len(pdf)], dtype=np.int64),
                "total_chars": np.array([pdf["n_chars"].sum()], dtype=np.int64),
            }
        )

    d = _docs(spark, sf)
    return d.groupBy("source").applyInPandas(
        summarize, "source string, n_docs long, total_chars long"
    )


@register(
    "udf_map_batches",
    "SELECT doc_id, CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9]+')) AS BIGINT)"
    " AS n_tokens FROM documents",
)
def udf_map_batches(spark, sf):
    from ..operators.tokenizer import tokenize_batch

    def count_tokens(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            toks, _, _ = tokenize_batch(pdf["text"], fine=False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_tokens": np.fromiter(
                        (len(t) for t in toks), count=len(toks), dtype=np.int64
                    ),
                }
            )

    d = _docs(spark, sf).select("doc_id", "text")
    return d.mapInPandas(count_tokens, "doc_id long, n_tokens long")


@register(
    "udtf",
    # Python UDTF (Spark 4): explode documents into fixed-size text chunks
    "SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, chunk FROM ("
    " SELECT doc_id, CAST(generate_subscripts(chunks, 1) - 1 AS INT) AS chunk_idx, "
    "  unnest(chunks) AS chunk FROM ("
    "  SELECT doc_id, [SUBSTRING(text, s, 100) "
    "   FOR s IN range(1, GREATEST(LENGTH(text), 1) + 1, 100)] AS chunks "
    "  FROM documents))",
)
def udtf_chunks(spark, sf):
    # Arrow-optimized UDTF (no per-row Python; plan shows ArrowEvalPythonUDTF)
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    from pyspark.sql.functions import udtf as _udtf

    @_udtf(returnType="doc_id bigint, chunk_idx int, chunk string")
    class ChunkDoc:
        def eval(self, doc_id: int, text: str):
            t = text or ""
            n = max(len(t), 1)
            for i, s in enumerate(range(0, n, 100)):
                yield doc_id, i, t[s : s + 100]

    spark.udtf.register("rbs_chunk_doc", ChunkDoc)
    d = _docs(spark, sf)
    d.createOrReplaceTempView("rbs_docs_udtf")
    return spark.sql(
        "SELECT c.doc_id, c.chunk_idx, c.chunk FROM rbs_docs_udtf t, "
        "LATERAL rbs_chunk_doc(t.doc_id, t.text) c"
    )


@register(
    "udf_arrow_optimized",
    "SELECT doc_id, UPPER(lang) || ':' || CAST(n_chars AS VARCHAR) AS tagged "
    "FROM documents",
)
def udf_arrow_optimized(spark, sf):
    @F.udf(returnType="string", useArrow=True)
    def tag(lang: str, n_chars: int) -> str:
        return f"{lang.upper()}:{n_chars}"

    d = _docs(spark, sf)
    return d.select("doc_id", tag("lang", "n_chars").alias("tagged"))


# ----------------------------------------------------- file-format sources ----
# The reference's corpus IO is flat text files (BC2GM train.in/GENE.eval —
# see sources/bc2gm.py for that exact format); these keys cover the generic
# source formats by staging the documents table once per sf and reading it
# back through each reader. Oracle = the same rows from the parquet view.


def _stage_format(spark, sf: str, fmt: str) -> str:
    import os
    import tempfile

    out = os.path.join(
        tempfile.gettempdir(), f"rbs_src_{fmt}_{os.path.basename(sf.rstrip('/'))}"
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        d = _docs(spark, sf).select("doc_id", "lang", "source", "n_chars")
        if fmt == "csv":
            d.write.mode("overwrite").option("header", True).csv(out)
        elif fmt == "json":
            d.write.mode("overwrite").json(out)
        elif fmt == "orc":
            d.write.mode("overwrite").orc(out)
        elif fmt == "xml":
            (
                d.write.mode("overwrite")
                .format("xml")
                .option("rowTag", "doc")
                .save(out)
            )
        else:  # text: one tab-joined line per row
            d.select(
                F.concat_ws(
                    "\t",
                    F.col("doc_id").cast("string"),
                    "lang",
                    "source",
                    F.col("n_chars").cast("string"),
                ).alias("value")
            ).write.mode("overwrite").text(out)
    return out


@register(
    "sentence_break",
    # P1 sentence breaking (BANNER's SentenceBreaker stand-in): same
    # replace/split/window spelling as the Spark side — no lookbehind
    # (DuckDB's RE2 lacks it), offsets from the running length sum.
    "WITH s AS (SELECT doc_id, string_split("
    " replace(replace(replace(text, '. ', '.' || chr(1)), '! ', '!' || chr(1)),"
    " '? ', '?' || chr(1)), chr(1)) AS sents FROM documents), "
    "e AS (SELECT doc_id, CAST(generate_subscripts(sents, 1) - 1 AS INT) AS sent_idx,"
    " unnest(sents) AS sentence FROM s) "
    "SELECT doc_id, sent_idx, sentence, "
    "CAST(COALESCE(SUM(LENGTH(sentence) + 1) OVER ("
    " PARTITION BY doc_id ORDER BY sent_idx"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT) AS char_offset "
    "FROM e",
)
def sentence_break(spark, sf):
    from ..sources.transcripts import break_sentences

    return break_sentences(_docs(spark, sf))


_SRC_SQL = "SELECT doc_id, lang, source, n_chars FROM documents"


@register("source_csv", _SRC_SQL)
def source_csv(spark, sf):
    path = _stage_format(spark, sf, "csv")
    return (
        spark.read.option("header", True)
        .schema("doc_id long, lang string, source string, n_chars long")
        .csv(path)
    )


@register("source_orc", _SRC_SQL)
def source_orc(spark, sf):
    """ORC source — the second columnar format a lakehouse engine must
    read (Hive-era tables are overwhelmingly ORC); Spark's reader is
    built-in (unlike Avro, whose external jar is absent in this
    container — see NOTES env gates). The oracle reads the SAME rows
    from the parquet view, so a green row proves the ORC round-trip
    (writer + reader + schema) end-to-end. Columnar pruning/pushdown
    apply to ORC scans as to parquet."""
    path = _stage_format(spark, sf, "orc")
    return spark.read.orc(path).select("doc_id", "lang", "source", "n_chars")


_BIN_SQL = (
    "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes, "
    "md5(text) AS h_md5, substr(text, 1, 16) AS head "
    "FROM documents WHERE doc_id < 200"
)


def _stage_binary(spark, sf: str) -> str:
    """Stage a bounded slice of the corpus as one .bin FILE PER DOC —
    the layout a multimodal ingest actually sees (image/audio blobs as
    loose objects). Bounded (doc_id < 200) so staging writes at most
    200 small files once per sf; content is the doc's ASCII text bytes,
    which keeps the DuckDB oracle able to state the expected hash from
    the table (this DuckDB cannot md5 raw blobs)."""
    import os
    import tempfile

    out = os.path.join(
        tempfile.gettempdir(),
        f"rbs_src_bin_{os.path.basename(sf.rstrip('/'))}",
    )
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        rows = (
            _docs(spark, sf)
            .filter(F.col("doc_id") < 200)
            .select("doc_id", "text")
            .toPandas()
        )
        os.makedirs(out, exist_ok=True)
        for doc_id, text in rows.itertuples(index=False):
            with open(os.path.join(out, f"doc_{doc_id}.bin"), "wb") as f:
                f.write(text.encode("utf-8"))
        with open(done, "w") as f:
            f.write("ok")
    return out


@register("source_binary", _BIN_SQL)
def source_binary(spark, sf):
    """Binary-file source — ``spark.read.format("binaryFile")``, the
    ingestion path for multimodal blobs (images/audio/video as opaque
    bytes + path metadata, the mm_* operators' upstream). Reads a
    staged one-file-per-doc directory and recovers (id from the path,
    byte length, MD5 of the raw bytes, decoded prefix); the oracle
    states the same values from the documents view, so a green row
    proves the whole loop: stage → binaryFile scan → binary functions.

    Scale shape: binaryFile scans parallelize per file (at 100 TB the
    blob store IS the table); everything after the scan is a pure
    projection. pathGlobFilter prunes non-data files at listing time."""
    path = _stage_binary(spark, sf)
    b = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
    )
    return b.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("h_md5"),
        F.substring(F.col("content").cast("string"), 1, 16).alias("head"),
    )


@register("source_json", _SRC_SQL)
def source_json(spark, sf):
    path = _stage_format(spark, sf, "json")
    return spark.read.schema(
        "doc_id long, lang string, source string, n_chars long"
    ).json(path)


@register("source_text", _SRC_SQL)
def source_text(spark, sf):
    path = _stage_format(spark, sf, "text")
    raw = spark.read.text(path)
    parts = F.split("value", "\t")
    return raw.select(
        parts.getItem(0).cast("long").alias("doc_id"),
        parts.getItem(1).alias("lang"),
        parts.getItem(2).alias("source"),
        parts.getItem(3).cast("long").alias("n_chars"),
    )


_PYSRC_REGISTERED: set[int] = set()


@register("source_python_datasource", _SRC_SQL)
def source_python_datasource(spark, sf):
    """Custom Python DataSource (PySpark 4 ``pyspark.sql.datasource``):
    the user-extension scan path — a plug-in reader for a format no
    built-in source speaks, scheduled by Spark as one InputPartition
    per file with readers running in parallel Python workers (see
    sources/pysource.py). Reads the SAME staged tab-separated layout
    source_text reads with the built-in text reader, and the SAME
    documents-view oracle pins both — proving the plug-in path
    end-to-end (schema, partitioning, typed rows), not just that it
    returns something.

    Scale shape: partitions() lists files (driver-side metadata only);
    each file streams through its own worker — the same per-split
    parallelism as any scan. Python-side decode cost is the price of
    the extension point; for hot formats you'd promote the reader to a
    built-in (ORC/CSV/JSON/binaryFile keys on this surface)."""
    from ..sources.pysource import TsvDocsDataSource

    sid = id(spark)
    if sid not in _PYSRC_REGISTERED:
        spark.dataSource.register(TsvDocsDataSource)
        _PYSRC_REGISTERED.add(sid)
    path = _stage_format(spark, sf, "text")
    return (
        spark.read.format("rbs_tsv_docs")
        .option("path", path)
        .load()
        .select("doc_id", "lang", "source", "n_chars")
    )


# -------------------------------------------------------------- sinks ----

@register("sink_partitioned_parquet", None)  # rows-only on read-back
def sink_partitioned_parquet(spark, sf):
    import os
    import tempfile

    out = os.path.join(
        tempfile.gettempdir(), f"rbs_sink_{os.path.basename(sf.rstrip('/'))}"
    )
    d = _docs(spark, sf).withColumn("p_bucket", F.pmod(F.col("doc_id"), F.lit(8)))
    d.write.mode("overwrite").partitionBy("p_bucket").parquet(out)
    back = spark.read.parquet(out)
    return back.select("doc_id", "p_bucket").filter(F.col("p_bucket") == 3)


@register(
    "scan_partitioned",
    "SELECT doc_id, n_chars FROM documents WHERE doc_id % 8 = 3",
)
def scan_partitioned(spark, sf):
    import os
    import tempfile

    out = os.path.join(
        tempfile.gettempdir(), f"rbs_part_{os.path.basename(sf.rstrip('/'))}"
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        d = _docs(spark, sf).withColumn(
            "p_bucket", F.pmod(F.col("doc_id"), F.lit(8))
        )
        d.write.mode("overwrite").partitionBy("p_bucket").parquet(out)
    back = spark.read.parquet(out)
    # partition pruning: only the p_bucket=3 directory is scanned
    return back.filter(F.col("p_bucket") == 3).select("doc_id", "n_chars")


@register(
    "join_partition_pruned",
    # Dynamic partition pruning: the dim-side filter decides AT RUNTIME
    # which p_bucket partition directories of the fact are read. Bucket
    # membership is a pure function of doc_id, so the oracle states the
    # expected rows (and the pruning itself is plan-gated in pytest).
    "SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars, "
    "CAST(d.doc_id % 8 AS BIGINT) AS p_bucket "
    "FROM documents d JOIN (SELECT DISTINCT n_nationkey % 8 AS bucket "
    " FROM nation WHERE n_name IN ('NATION_3', 'NATION_5')) b "
    "ON d.doc_id % 8 = b.bucket",
)
def join_partition_pruned(spark, sf):
    """Dynamic partition pruning (DPP): join a partition-layout fact
    table on its PARTITION column against a filtered dimension — the
    fact directories to scan are only known at runtime, from the dim
    filter's result, and Spark injects that as a dynamicpruning
    partition filter on the scan. At 100 TB this is THE mechanism that
    turns "join against this week's keys" into reading 2 of 8 (or 2 of
    10,000) partition directories instead of the whole table; a static
    planner cannot do it because the pruning set is data-dependent.

    Scale shape: the dim subquery (nation -> 2 bucket values)
    broadcasts; its values reuse the broadcast exchange as the scan's
    runtime partition filter (visible as dynamicpruningexpression in
    PartitionFilters — pytest-gated); the fact side then scans exactly
    the surviving directories. Reuses the scan_partitioned staged
    layout (p_bucket = doc_id % 8)."""
    import os
    import tempfile

    out = os.path.join(
        tempfile.gettempdir(), f"rbs_part_{os.path.basename(sf.rstrip('/'))}"
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        d = _docs(spark, sf).withColumn(
            "p_bucket", F.pmod(F.col("doc_id"), F.lit(8))
        )
        d.write.mode("overwrite").partitionBy("p_bucket").parquet(out)
    fact = spark.read.parquet(out)
    dim = (
        __import__("reach_banner_spark.caching", fromlist=["cached_scan"]).cached_scan(spark, f"{sf}/nation.parquet")
        .filter(F.col("n_name").isin("NATION_3", "NATION_5"))
        .select(F.pmod(F.col("n_nationkey"), F.lit(8)).alias("bucket"))
        .distinct()
    )
    return fact.join(
        F.broadcast(dim), fact["p_bucket"] == dim["bucket"]
    ).select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("p_bucket").cast("long").alias("p_bucket"),
    )


@register(
    "sort_within_partitions",
    None,  # per-partition order is not SQL-observable; rows-only + pytest
)
def sort_within_partitions(spark, sf):
    d = _docs(spark, sf)
    return (
        d.repartition(4, "source")
        .sortWithinPartitions("source", "doc_id")
        .select("doc_id", "source")
    )


@register("limit", "SELECT doc_id FROM documents ORDER BY doc_id LIMIT 10")
def limit_q(spark, sf):
    return _docs(spark, sf).select("doc_id").orderBy("doc_id").limit(10)


# Strong-edge backbone + all-pairs BFS SQL fragments — shared by the
# kg_diameter / kg_closeness / kg_bridges oracles (the graph definition
# lives ONCE; see kg_diameter's docstring for the exact-integer
# above-mean support cut).
_STRONG_SQL = (
    "p AS (SELECT conv_id, LEAST(subj, obj) AS a, GREATEST(subj, obj) AS b, "
    " COUNT(*) AS n FROM t GROUP BY 1, 2, 3), "
    "st AS (SELECT conv_id, SUM(n) AS tot, COUNT(*) AS ne FROM p GROUP BY 1), "
    "sp0 AS (SELECT p.conv_id, a, b FROM p JOIN st USING (conv_id) "
    " WHERE p.n * st.ne > st.tot), "
    "e AS (SELECT conv_id, a AS s, b AS o FROM sp0 "
    " UNION SELECT conv_id, b, a FROM sp0)"
)

_ALLPAIRS_SQL = (
    f"WITH RECURSIVE t AS ({_TRIPLES_SQL}), "
    f"{_STRONG_SQL}, "
    "nodes AS (SELECT DISTINCT conv_id, s AS node FROM e), "
    "r(conv_id, src, node, d) AS ("
    " SELECT conv_id, node, node, 0 FROM nodes "
    " UNION "
    " SELECT e.conv_id, r.src, e.o, r.d + 1 FROM r JOIN e "
    f"  ON e.conv_id = r.conv_id AND e.s = r.node WHERE r.d < {_REACH_MAX_HOPS}), "
    "sp AS (SELECT conv_id, src, node, MIN(d) AS d FROM r GROUP BY 1, 2, 3) "
)


@register(
    "kg_diameter",
    # All-pairs BFS per conversation (the oracle recursion seeds EVERY
    # node as its own source — the multi-source generalization of
    # kg_reach's single-seed CTE) over the STRONG-EDGE backbone: only
    # pairs whose co-occurrence support is strictly above the
    # conversation's own mean (exact integer cross-multiplication —
    # n * n_edges > total — so the cut is scale-invariant and no float
    # ever decides an edge). The raw graph is near-complete (diameter 1
    # everywhere); the confidence-thresholded backbone is both the graph
    # a production KG keeps and the one whose geometry is informative.
    # avg_dist is ONE division of exact integers, then ROUND/%.6f.
    _ALLPAIRS_SQL + "SELECT conv_id, "
    "CAST(COUNT(DISTINCT src) AS BIGINT) AS n_nodes, "
    "CAST(MAX(d) AS INT) AS diameter, "
    "CAST(SUM(CASE WHEN src <> node THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs, "
    "printf('%.6f', ROUND("
    " CAST(SUM(CASE WHEN src <> node THEN d ELSE 0 END) AS DOUBLE) "
    " / SUM(CASE WHEN src <> node THEN 1 ELSE 0 END), 6)) AS avg_dist "
    "FROM sp GROUP BY conv_id",
)
def kg_diameter(spark, sf):
    """Per-conversation graph diameter, reachable-pair count, and mean
    shortest-path length over the undirected entity graph — the
    connectivity health profile (is this conversation's knowledge one
    tight cluster or a long chain?). Computed as ALL-PAIRS BFS: the same
    frontier iteration as ``kg_reach`` but with a (src, node) composite
    state, i.e. every node is simultaneously a BFS source. The graph is
    the strong-edge backbone: undirected pairs whose triple support is
    strictly above their conversation's mean support (the
    confidence-threshold cut a production KG applies before exposing
    structure; the raw co-occurrence graph here is near-complete and its
    geometry says nothing). The cut compares n * n_edges > total — exact
    integers, scale-invariant across corpus sizes.

    Scale shape: the state table is bounded by conversations × entity
    domain² (the kg_two_hop bound — the dictionary caps it, never turn
    volume), iterations are FIXED at ``_REACH_MAX_HOPS`` so there are
    zero in-loop driver barriers, ``localCheckpoint`` cuts lineage per
    round, and every join keys conv_id-first on the one co-partitioning.
    Any conversation with an edge has ≥ 2 distinct nodes, so n_pairs ≥ 2
    and the avg_dist division can never see a zero denominator."""
    dist = _strong_allpairs_dist(spark, sf)
    off_diag = F.when(F.col("src") != F.col("node"), F.lit(1)).otherwise(F.lit(0))
    off_d = F.when(F.col("src") != F.col("node"), F.col("d")).otherwise(F.lit(0))
    return dist.groupBy("conv_id").agg(
        F.countDistinct("src").alias("n_nodes"),
        F.max("d").cast("int").alias("diameter"),
        F.sum(off_diag).alias("n_pairs"),
        F.format_string(
            "%.6f",
            F.round(
                F.sum(off_d).cast("double") / F.sum(off_diag), 6
            ),
        ).alias("avg_dist"),
    )


def _strong_canon_edges(t: DataFrame) -> DataFrame:
    """Canonically-oriented (conv_id, a, b) strong-backbone edges: pairs
    whose co-occurrence support n is strictly above the conversation's
    own mean (n * n_edges > total — exact integers, scale-invariant; see
    kg_diameter). Shared graph definition for the diameter / closeness /
    bridges family; ``localCheckpoint``ed because every consumer either
    iterates joins against it or feeds both a sym-union and a kernel."""
    pairs = t.groupBy(
        "conv_id",
        F.least("subj", "obj").alias("a"),
        F.greatest("subj", "obj").alias("b"),
    ).agg(F.count(F.lit(1)).alias("n"))
    st = pairs.groupBy("conv_id").agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("ne")
    )
    return (
        pairs.join(st, "conv_id")
        .where(F.col("n") * F.col("ne") > F.col("tot"))
        .select("conv_id", "a", "b", "n")
        .localCheckpoint()
    )


def _sym_of_canon(strong: DataFrame) -> DataFrame:
    """Symmetrized distinct (conv_id, s, o) view of a canonical (a < b)
    strong-edge set — the shared spelling for every consumer of
    ``_strong_edges_cached`` that needs both directions (the all-pairs
    build, knn(k), c(k))."""
    return (
        strong.select("conv_id", F.col("a").alias("s"), F.col("b").alias("o"))
        .union(
            strong.select(
                "conv_id", F.col("b").alias("s"), F.col("a").alias("o")
            )
        )
        .distinct()
    )


def _strong_sym_edges(t: DataFrame) -> DataFrame:
    """Symmetrized (conv_id, s, o) view of the strong backbone."""
    strong = _strong_canon_edges(t)
    return strong.select(
        "conv_id", F.col("a").alias("s"), F.col("b").alias("o")
    ).union(
        strong.select("conv_id", F.col("b").alias("s"), F.col("a").alias("o"))
    ).distinct()


# Strong-edge memo, same discipline as _ALLPAIRS_MEMO below: FIVE keys
# (bridges/articulation/mst/graph-health + the all-pairs build) derive
# the identical checkpointed edge set — without the memo one
# macro_graph_health invocation materialized it three times (r5
# session-12 review finding).
_STRONG_MEMO: dict = {}


def _strong_edges_cached(spark, sf) -> DataFrame:
    """Memoized ``_strong_canon_edges`` over the materialized triple
    table, keyed by (SparkContext, corpus, triples version)."""
    memo_key = (
        spark.sparkContext.applicationId,
        sf,
        _TRIPLES_TABLE_VERSION,
    )
    cached = _STRONG_MEMO.get(memo_key)
    if cached is None:
        cached = _strong_canon_edges(_triples_table(spark, sf))
        _STRONG_MEMO[memo_key] = cached
    return cached


# Process-local memo for the all-pairs table: the 7 fixed frontier
# rounds cost ~2 s of checkpoint latency at sf0.1 (fixed overhead, not
# data scaling) and THREE keys consume the identical table
# (diameter/closeness/components) — the _triples_table amortization
# discipline, in-session instead of on-disk because checkpointed RDDs
# live exactly as long as their SparkContext. Keyed by application id
# so a fresh session can never see another context's RDDs.
_ALLPAIRS_MEMO: dict = {}


def _strong_allpairs_dist(spark, sf) -> DataFrame:
    """All-pairs BFS hop distances (conv_id, src, node, d) over the
    strong backbone — the shared derivation of ``kg_diameter``,
    ``kg_closeness`` and ``kg_components``: every node is simultaneously
    a BFS source, FIXED ``_REACH_MAX_HOPS`` frontier iterations (zero
    in-loop driver barriers), ``localCheckpoint`` per round, every join
    keyed conv_id-first. Memoized per (SparkContext, corpus) — see
    ``_ALLPAIRS_MEMO``."""
    memo_key = (
        spark.sparkContext.applicationId,
        sf,
        _TRIPLES_TABLE_VERSION,
    )
    cached = _ALLPAIRS_MEMO.get(memo_key)
    if cached is not None:
        return cached
    strong = _strong_edges_cached(spark, sf)
    e = strong.select(
        "conv_id", F.col("a").alias("s"), F.col("b").alias("o")
    ).union(
        strong.select("conv_id", F.col("b").alias("s"), F.col("a").alias("o"))
    ).distinct().localCheckpoint()
    nodes = e.select("conv_id", F.col("s").alias("node")).distinct()
    dist = (
        nodes.select("conv_id", F.col("node").alias("src"), "node")
        .withColumn("d", F.lit(0))
        .localCheckpoint()
    )
    frontier = dist
    for d in range(1, _REACH_MAX_HOPS + 1):
        fr = frontier.select(
            F.col("conv_id").alias("f_conv"),
            F.col("src").alias("f_src"),
            F.col("node").alias("f_node"),
        )
        reached = fr.join(
            e,
            (F.col("f_conv") == F.col("conv_id"))
            & (F.col("f_node") == F.col("s")),
        ).select(
            "conv_id", F.col("f_src").alias("src"), F.col("o").alias("node")
        )
        fresh = (
            reached.distinct()
            .join(
                dist.select("conv_id", "src", "node"),
                ["conv_id", "src", "node"],
                "left_anti",
            )
            .withColumn("d", F.lit(d))
            .localCheckpoint()
        )
        dist = dist.unionByName(fresh)
        frontier = fresh
    # the union-of-checkpoints is cheap to re-traverse but each key's
    # first action would still walk 8 checkpointed segments; one final
    # checkpoint collapses it before the memo hands it to 3 consumers
    dist = dist.localCheckpoint()
    _ALLPAIRS_MEMO[memo_key] = dist
    return dist


@register(
    "kg_closeness",
    # Per-entity closeness over the SAME all-pairs BFS table as
    # kg_diameter (shared _ALLPAIRS_SQL recursion): n_reach and
    # total_dist are exact integers; closeness = n_reach/total_dist is
    # ONE IEEE division under ROUND-then-%.6f. Nodes whose only strong
    # edges are self-loops reach nobody and are excluded (HAVING).
    _ALLPAIRS_SQL + "SELECT conv_id, src AS entity, "
    "CAST(SUM(CASE WHEN src <> node THEN 1 ELSE 0 END) AS BIGINT) "
    " AS n_reach, "
    "CAST(SUM(d) AS BIGINT) AS total_dist, "
    "printf('%.6f', ROUND("
    " CAST(SUM(CASE WHEN src <> node THEN 1 ELSE 0 END) AS DOUBLE) "
    " / CAST(SUM(d) AS DOUBLE), 6)) AS closeness "
    "FROM sp GROUP BY conv_id, src HAVING SUM(d) > 0",
)
def kg_closeness(spark, sf):
    """Per-entity closeness centrality over the strong-edge backbone —
    which entities sit CLOSE to everything in their conversation's
    graph (small average hop distance), the complement of
    ``kg_betweenness``'s broker score: a hub can be central without
    brokering, a bridge endpoint can broker without being close.
    Defined as n_reach / total_dist (reachable-count over summed hop
    distances — the component-local closeness that stays comparable
    across disconnected graphs); both terms are exact integers from
    the shared all-pairs BFS, so ranking ties can never be decided by
    a float and the reported ratio is ONE correctly-rounded IEEE
    division under the shared ROUND/%.6f contract.

    Scale shape: reuses ``_strong_allpairs_dist`` — the kg_diameter
    derivation — so the state stays bounded by conversations × entity
    domain² with zero in-loop driver barriers; the final rollup groups
    the SAME table by (conv_id, src) instead of conv_id. Self-loop-only
    nodes (total_dist = 0) are excluded on both engines."""
    dist = _strong_allpairs_dist(spark, sf)
    off = F.when(F.col("src") != F.col("node"), F.lit(1)).otherwise(F.lit(0))
    agg = dist.groupBy("conv_id", "src").agg(
        F.sum(off).cast("long").alias("n_reach"),
        F.sum("d").cast("long").alias("total_dist"),
    )
    return agg.where(F.col("total_dist") > 0).select(
        "conv_id",
        F.col("src").alias("entity"),
        "n_reach",
        "total_dist",
        F.format_string(
            "%.6f",
            F.round(
                F.col("n_reach").cast("double")
                / F.col("total_dist").cast("double"),
                6,
            ),
        ).alias("closeness"),
    )


@register(
    "kg_bridges",
    # The ORACLE takes the definition literally: an edge (a, b) is a
    # bridge iff b is unreachable from a when that one edge is removed —
    # one reachability recursion PER EDGE (state: edges × nodes per
    # conversation, fine at oracle scale). The Spark side runs Tarjan's
    # linear-time low-link algorithm — a completely independent
    # formulation, so agreement is a real algorithmic cross-check.
    f"WITH RECURSIVE t AS ({_TRIPLES_SQL}), "
    f"{_STRONG_SQL}, "
    "r(conv_id, ea, eb, node) AS ("
    " SELECT conv_id, a, b, a FROM sp0 "
    " UNION "
    " SELECT r.conv_id, r.ea, r.eb, e.o FROM r JOIN e "
    "  ON e.conv_id = r.conv_id AND e.s = r.node "
    "  WHERE NOT (LEAST(e.s, e.o) = r.ea AND GREATEST(e.s, e.o) = r.eb)) "
    "SELECT s.conv_id, s.a, s.b FROM sp0 s LEFT JOIN r "
    " ON r.conv_id = s.conv_id AND r.ea = s.a AND r.eb = s.b "
    " AND r.node = s.b "
    "WHERE r.node IS NULL",
)
def kg_bridges(spark, sf):
    """Bridge (cut-edge) detection per conversation over the strong
    backbone — the single points of failure of each conversation's
    knowledge graph: removing a bridge disconnects it, so these are the
    facts whose loss partitions what the KG knows (the robustness
    audit a production graph runs before pruning low-support edges).
    Tarjan's low-link algorithm is inherently sequential per graph, so
    this is the class-(b) custom-operator pattern (``kg_betweenness``
    precedent): a grouped-map ``applyInPandas`` kernel runs the exact
    linear-time DFS over ONE conversation's canonical edge list, and
    Spark distributes across conversations — the 100 TB axis. Output
    is the bridge edge set — a graph invariant, independent of DFS
    order, all-integer (no floats anywhere).

    The oracle is a per-edge-removal reachability recursion (a
    DIFFERENT formulation — definition vs algorithm), making agreement
    a genuine algorithmic cross-check; pytest additionally pins a
    remove-edge BFS twin and a handcrafted two-triangles-one-bridge
    case. Self-loops are never bridges (their endpoint seeds its own
    reachability) and never emitted by either side.

    Scale shape: ONE conv_id exchange (the grouped map's) over the
    dimension-scale strong edge set; per-task cost is O(V + E) bounded
    by the per-conv entity domain, never by turns."""
    strong = _strong_edges_cached(spark, sf).select(
        "conv_id", "a", "b"
    )

    def per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        conv = pdf["conv_id"].iloc[0]
        adj: dict = {}
        for a, b in zip(pdf["a"], pdf["b"]):
            if a == b:
                adj.setdefault(a, set())
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        nodes = sorted(adj)
        adj = {v: sorted(adj[v]) for v in nodes}
        bridges = _tarjan_bridges(nodes, adj)
        bridges.sort()
        return pd.DataFrame(
            {
                "conv_id": [conv] * len(bridges),
                "a": [x for x, _ in bridges],
                "b": [y for _, y in bridges],
            }
        )

    return strong.groupBy("conv_id").applyInPandas(
        per_conv, "conv_id string, a string, b string"
    )


def _tarjan_bridges(nodes, adj):
    """Bridge half of ``_tarjan_cuts`` (kept as the kg_bridges kernel's
    entry point)."""
    return _tarjan_cuts(nodes, adj)[0]


def _tarjan_cuts(nodes, adj):
    """Iterative Tarjan low-link pass over a simple undirected graph
    (sorted adjacency — deterministic traversal; both output SETS are
    graph invariants regardless). Returns (bridges, articulation
    points): a tree edge (p, v) is a bridge iff low[v] > disc[p]; a
    non-root p is an articulation point iff some tree child v has
    low[v] >= disc[p]; a root is one iff it has >= 2 tree children."""
    disc: dict = {}
    low: dict = {}
    bridges = []
    arts = set()
    timer = 0
    for root in nodes:
        if root in disc:
            continue
        disc[root] = low[root] = timer
        timer += 1
        root_children = 0
        stack = [(root, None, iter(adj[root]))]
        while stack:
            v, parent, it = stack[-1]
            advanced = False
            for w in it:
                if w not in disc:
                    disc[w] = low[w] = timer
                    timer += 1
                    stack.append((w, v, iter(adj[w])))
                    advanced = True
                    break
                elif w != parent:
                    low[v] = min(low[v], disc[w])
            if not advanced:
                stack.pop()
                if parent is not None:
                    low[parent] = min(low[parent], low[v])
                    if low[v] > disc[parent]:
                        bridges.append(
                            (min(parent, v), max(parent, v))
                        )
                    if parent == root:
                        root_children += 1
                    elif low[v] >= disc[parent]:
                        arts.add(parent)
        if root_children >= 2:
            arts.add(root)
    return bridges, sorted(arts)


@register(
    "kg_articulation",
    # The ORACLE again takes the definition literally: v is an
    # articulation point iff deleting it INCREASES the number of
    # connected components — component counts via min-label closure
    # over a per-candidate-removal reachability recursion (state:
    # nodes^3 per conversation — fine at oracle scale, the entity
    # domain is dictionary-bounded), with the baseline component count
    # read from the SAME all-pairs table kg_diameter/kg_closeness use.
    _ALLPAIRS_SQL +
    # the baseline closure r0 is UNBOUNDED like rx — a hop-bounded c0
    # against an unbounded c1 could mis-flag if a component's diameter
    # ever exceeded _REACH_MAX_HOPS (r5 session-12 review finding)
    ", r0(conv_id, src, node) AS ("
    " SELECT conv_id, node, node FROM nodes "
    " UNION "
    " SELECT r0.conv_id, r0.src, e.o FROM r0 JOIN e "
    "  ON e.conv_id = r0.conv_id AND e.s = r0.node), "
    "base AS (SELECT conv_id, src, MIN(node) AS lbl FROM r0 "
    " GROUP BY 1, 2), "
    "bc AS (SELECT conv_id, COUNT(DISTINCT lbl) AS c0 FROM base "
    " GROUP BY 1), "
    "rx(conv_id, excl, src, node) AS ("
    " SELECT n1.conv_id, x.node, n1.node, n1.node "
    " FROM nodes n1 JOIN nodes x ON x.conv_id = n1.conv_id "
    "  AND x.node <> n1.node "
    " UNION "
    " SELECT rx.conv_id, rx.excl, rx.src, e.o FROM rx JOIN e "
    "  ON e.conv_id = rx.conv_id AND e.s = rx.node "
    "  WHERE e.o <> rx.excl AND e.s <> rx.excl), "
    "xb AS (SELECT conv_id, excl, src, MIN(node) AS lbl FROM rx "
    " GROUP BY 1, 2, 3), "
    "xc AS (SELECT conv_id, excl, COUNT(DISTINCT lbl) AS c1 FROM xb "
    " GROUP BY 1, 2) "
    "SELECT xc.conv_id, excl AS entity FROM xc JOIN bc "
    " ON bc.conv_id = xc.conv_id WHERE xc.c1 > bc.c0",
)
def kg_articulation(spark, sf):
    """Articulation-point (cut-vertex) detection per conversation over
    the strong backbone — the node-level complement of ``kg_bridges``:
    entities whose removal disconnects their conversation's graph, i.e.
    the single entities the KG's connectivity depends on (a bridge's
    endpoints are usually articulation points, but a cut vertex needs
    no bridge — two triangles sharing one vertex have a cut vertex and
    zero bridges, which the handcrafted pytest case pins). Same
    class-(b) kernel pattern: ONE Tarjan low-link pass per conversation
    inside a grouped-map ``applyInPandas`` task (the SHARED
    ``_tarjan_cuts`` pass also emits kg_bridges' edges), distributed by
    conversation; all-integer output.

    The oracle is the definitional component-count-increase test —
    min-label closure over a per-candidate-removal reachability
    recursion, with the baseline count read from the SHARED
    ``_ALLPAIRS_SQL`` table — a genuinely different formulation, so
    agreement is an algorithmic cross-check; pytest additionally pins a
    remove-node BFS twin, handcrafted graphs, and a determinism re-run.

    Scale shape: ONE conv_id exchange over the dimension-scale strong
    edge set; O(V + E) per conversation."""
    strong = _strong_edges_cached(spark, sf).select(
        "conv_id", "a", "b"
    )

    def per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        conv = pdf["conv_id"].iloc[0]
        adj: dict = {}
        for a, b in zip(pdf["a"], pdf["b"]):
            if a == b:
                adj.setdefault(a, set())
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        nodes = sorted(adj)
        adj = {v: sorted(adj[v]) for v in nodes}
        arts = _tarjan_cuts(nodes, adj)[1]
        return pd.DataFrame(
            {"conv_id": [conv] * len(arts), "entity": arts}
        )

    return strong.groupBy("conv_id").applyInPandas(
        per_conv, "conv_id string, entity string"
    )


@register(
    "kg_growth",
    # KG growth curve: facts bucketed by the window in which they were
    # FIRST observed, with the running cumulative size — all exact
    # integers; the running sum's window sits over the turn-window
    # domain, never facts.
    f"WITH t AS ({_TRIPLES_SQL}), "
    "f AS (SELECT subj, pred, obj, MIN(window_start) AS w0 FROM t "
    " GROUP BY 1, 2, 3), "
    "c AS (SELECT w0, CAST(COUNT(*) AS BIGINT) AS new_facts FROM f "
    " GROUP BY w0) "
    "SELECT CAST(w0 AS INT) AS window_start, new_facts, "
    "CAST(SUM(new_facts) OVER (ORDER BY w0) AS BIGINT) AS cum_facts "
    "FROM c",
)
def kg_growth(spark, sf):
    """KG growth curve — when did the graph learn what: per turn-window,
    how many distinct (subj, pred, obj) facts were observed for the
    FIRST time, plus the cumulative graph size. The monitoring query an
    incremental KG pipeline (``stream_triples``/``stream_kg``) publishes
    to show convergence: a flattening curve means the corpus has stopped
    teaching.

    Scale shape: one fact-keyed aggregation over the materialized triple
    table (entity² × predicate domain — the kg_temporal_span bound),
    one window-keyed count, and a running sum over the TURN-WINDOW-sized
    curve; nothing fact-scale crosses an unpartitioned boundary."""
    return growth_curve(_triples_table(spark, sf))


def growth_curve(t) -> "DataFrame":
    """The growth-curve rollup over a (conv_id, window_start, subj, pred,
    obj) triple set — shared between ``kg_growth`` (materialized table)
    and the ``stream_growth`` ingest twin (incrementally assembled
    triples): first-seen window per distinct fact, new-fact count per
    window, running cumulative size. min() is exactly mergeable, so the
    twin may run this over any exactly-once union of batch outputs."""
    f0 = t.groupBy("subj", "pred", "obj").agg(
        F.min("window_start").alias("w0")
    )
    c = f0.groupBy("w0").agg(F.count(F.lit(1)).alias("new_facts"))
    w = Window.orderBy("w0").rowsBetween(Window.unboundedPreceding, 0)
    return c.select(
        F.col("w0").cast("int").alias("window_start"),
        "new_facts",
        F.sum("new_facts").over(w).cast("long").alias("cum_facts"),
    )


@register(
    "kg_reciprocity",
    # Per-predicate reciprocity over the DISTINCT conv-scoped directed
    # edge set: an edge is reciprocal if the reversed pair exists under
    # the SAME conv and predicate. Exact integer counts; the ratio is one
    # division under the %.6f rule.
    f"WITH t AS ({_TRIPLES_SQL}), "
    "e AS (SELECT DISTINCT conv_id, pred, subj, obj FROM t), "
    "r AS (SELECT e.* FROM e JOIN e x ON x.conv_id = e.conv_id "
    " AND x.pred = e.pred AND x.subj = e.obj AND x.obj = e.subj) "
    "SELECT e.pred, CAST(COUNT(*) AS BIGINT) AS n_edges, "
    "CAST(SUM(CASE WHEN r.subj IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) "
    " AS n_reciprocal, "
    "printf('%.6f', ROUND(SUM(CASE WHEN r.subj IS NOT NULL THEN 1 ELSE 0 "
    " END) * CAST(1 AS DOUBLE) / COUNT(*), 6)) AS reciprocity "
    "FROM e LEFT JOIN r ON r.conv_id = e.conv_id AND r.pred = e.pred "
    " AND r.subj = e.subj AND r.obj = e.obj "
    "GROUP BY e.pred",
)
def kg_reciprocity(spark, sf):
    """Predicate reciprocity — what fraction of a predicate's directed
    edges have the reverse edge in the same conversation. The KG-schema
    diagnostic that separates symmetric relations (``co_mentioned`` reads
    near-symmetric by construction) from directional ones
    (``asked_about``/``answered_with`` encode turn order and should sit
    near zero) — the signal an ontology builder uses to decide which
    predicates to canonicalize as undirected.

    Scale shape: the kg_triangles discipline — reduce to the DISTINCT
    conv-scoped edge set first (bounded by convs × entity-domain², far
    below raw triples), then ONE self-join on the reversed key; every
    shuffle keys conv_id-first, and the rollup is predicate-domain
    sized."""
    t = _triples_table(spark, sf)
    e = t.select("conv_id", "pred", "subj", "obj").distinct()
    rev = (
        e.select(
            F.col("conv_id").alias("r_conv"),
            F.col("pred").alias("r_pred"),
            F.col("subj").alias("r_obj"),
            F.col("obj").alias("r_subj"),
        )
        .distinct()
    )
    marked = e.join(
        rev,
        (F.col("conv_id") == F.col("r_conv"))
        & (F.col("pred") == F.col("r_pred"))
        & (F.col("subj") == F.col("r_subj"))
        & (F.col("obj") == F.col("r_obj")),
        "left",
    )
    recip = F.when(F.col("r_subj").isNotNull(), 1).otherwise(0)
    return marked.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(recip).cast("long").alias("n_reciprocal"),
        F.format_string(
            "%.6f",
            F.round(
                F.sum(recip).cast("double") / F.count(F.lit(1)), 6
            ),
        ).alias("reciprocity"),
    )


@register(
    "kg_assortativity",
    # Degree assortativity over the symmetrized distinct edge set:
    # Pearson correlation of (deg(s), deg(o)) across directed edge
    # copies — the standard undirected estimator. All sufficient
    # statistics are exact integers; the coefficient is the
    # agg_stats_corr fixed IEEE chain under the %.6f rule.
    f"WITH t AS ({_TRIPLES_SQL}), e AS ({_EDGES_SYM_SQL}), "
    "deg AS (SELECT conv_id, s AS node, CAST(COUNT(*) AS BIGINT) AS d "
    " FROM e GROUP BY 1, 2), "
    "p AS (SELECT ds.d AS x, dd.d AS y FROM e "
    " JOIN deg ds ON ds.conv_id = e.conv_id AND ds.node = e.s "
    " JOIN deg dd ON dd.conv_id = e.conv_id AND dd.node = e.o), "
    "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges, "
    " CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
    " CAST(SUM(x * y) AS BIGINT) AS sxy, "
    " CAST(SUM(x * x) AS BIGINT) AS sxx, "
    " CAST(SUM(y * y) AS BIGINT) AS syy FROM p) "
    "SELECT n_edges, "
    "printf('%.6f', ROUND(CAST(n_edges * sxy - sx * sy AS DOUBLE) / "
    " (SQRT(CAST(n_edges * sxx - sx * sx AS DOUBLE)) * "
    "  SQRT(CAST(n_edges * syy - sy * sy AS DOUBLE))), 6)) "
    " AS assortativity "
    "FROM s WHERE n_edges * sxx > sx * sx AND n_edges * syy > sy * sy",
)
def kg_assortativity(spark, sf):
    """Degree assortativity of the extracted graph — do well-connected
    entities link to other hubs (r > 0, social-network shape) or to
    leaves (r < 0, hub-and-spoke shape)? The one-number structural
    fingerprint that, next to ``kg_clustering`` and ``kg_degree_dist``,
    tells a KG consumer which graph-algorithm regime they are in
    (Newman 2002's mixing coefficient, computed exactly).

    Scale shape: the kg_triangles discipline — everything derives from
    the DISTINCT symmetrized edge set (bounded by convs ×
    entity-domain²); the degree table joins back twice on
    (conv_id, node) — co-partitioned with the edge set's own key — and
    the final sufficient-statistic rollup is ONE single-row aggregate
    of exact integers (degrees are bounded by the entity domain, so no
    overflow anywhere near 2^53)."""
    e = _sym_edges(_triples_table(spark, sf))
    deg = e.groupBy("conv_id", F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    p = (
        e.join(
            deg.select(
                F.col("conv_id").alias("sc"),
                F.col("node").alias("sn"),
                F.col("d").alias("x"),
            ),
            (F.col("sc") == F.col("conv_id")) & (F.col("sn") == F.col("s")),
        )
        .join(
            deg.select(
                F.col("conv_id").alias("oc"),
                F.col("node").alias("on"),
                F.col("d").alias("y"),
            ),
            (F.col("oc") == F.col("conv_id")) & (F.col("on") == F.col("o")),
        )
        .select("x", "y")
    )
    s = p.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    n = F.col("n_edges")
    sx, sy = F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    den = F.sqrt((n * F.col("sxx") - sx * sx).cast("double")) * F.sqrt(
        (n * F.col("syy") - sy * sy).cast("double")
    )
    return (
        s.filter(
            (n * F.col("sxx") > sx * sx) & (n * F.col("syy") > sy * sy)
        )
        .select(
            "n_edges",
            F.format_string("%.6f", F.round(num / den, 6)).alias(
                "assortativity"
            ),
        )
    )


@register(
    "kg_provenance",
    # Per-fact provenance: every distinct assertion with its supporting
    # window list (sorted, comma-joined — array formatting differs
    # between engines), support count, and first/last window.
    f"WITH t AS ({_TRIPLES_SQL}) "
    "SELECT conv_id, subj, pred, obj, "
    "CAST(COUNT(*) AS BIGINT) AS n_windows, "
    "CAST(MIN(window_start) AS INT) AS first_w, "
    "CAST(MAX(window_start) AS INT) AS last_w, "
    "string_agg(CAST(window_start AS VARCHAR), ',' ORDER BY window_start) "
    " AS windows "
    "FROM t GROUP BY conv_id, subj, pred, obj",
)
def kg_provenance(spark, sf):
    """Per-fact provenance record — the audit column a production KG
    publishes next to every assertion: which windows (turn positions)
    support the fact, how many, and the first/last sighting. Downstream
    consumers use it for evidence display and recency-weighted
    confidence.

    Scale shape: ONE hash aggregate over the materialized triple table,
    keyed conv_id-first (co-partitioned with the table's bucketing).
    The collected window list is bounded by windows-per-conversation,
    not corpus size; sorted before joining so the string is
    deterministic under any partial-agg merge order."""
    t = _triples_table(spark, sf)
    return t.groupBy("conv_id", "subj", "pred", "obj").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.min("window_start").cast("int").alias("first_w"),
        F.max("window_start").cast("int").alias("last_w"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("window_start")),
                lambda v: v.cast("string"),
            ),
            ",",
        ).alias("windows"),
    )


@register(
    "kg_canonical_facts",
    # Conflict RESOLUTION (the write side of kg_pred_conflicts' audit):
    # one winning object per (conv, subj, pred) under the deterministic
    # total order (support DESC, first_w ASC, obj ASC).
    f"WITH t AS ({_TRIPLES_SQL}), "
    "s AS (SELECT conv_id, subj, pred, obj, "
    " CAST(COUNT(*) AS BIGINT) AS support, "
    " CAST(MIN(window_start) AS INT) AS first_w "
    " FROM t GROUP BY conv_id, subj, pred, obj), "
    "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, subj, pred "
    " ORDER BY support DESC, first_w ASC, obj ASC) AS rn FROM s) "
    "SELECT conv_id, subj, pred, obj, support, first_w "
    "FROM r WHERE rn = 1",
)
def kg_canonical_facts(spark, sf):
    """Canonical-fact selection — resolve the multi-object groups
    ``kg_pred_conflicts`` surfaces by electing ONE object per
    (conv, subj, pred): most-supported wins, earliest first sighting
    breaks support ties, lexicographic object breaks exact ties (a
    total order, so the winner is deterministic for any execution).
    This is the compaction step that turns an extraction log into a
    publishable fact table.

    Scale shape: the support aggregate keys conv_id-first on the
    bucketed triple table; the ROW_NUMBER window runs over the
    aggregated support table (bounded by entity-domain² per
    conversation, not raw triples) and reuses the same conv_id-first
    partitioning."""
    t = _triples_table(spark, sf)
    s = t.groupBy("conv_id", "subj", "pred", "obj").agg(
        F.count(F.lit(1)).cast("long").alias("support"),
        F.min("window_start").cast("int").alias("first_w"),
    )
    w = Window.partitionBy("conv_id", "subj", "pred").orderBy(
        F.col("support").desc(), F.col("first_w").asc(), F.col("obj").asc()
    )
    return (
        s.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "udf_map_arrow",
    # mapInArrow twin: exact-integer per-vector facts (dimensionality,
    # positive-component count, argmax index) — float32 COMPARISONS are
    # engine-exact even though float arithmetic wouldn't be.
    "SELECT vec_id, CAST(LEN(embedding) AS BIGINT) AS n_dims, "
    "CAST(LEN(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos, "
    "CAST(list_position(embedding, list_max(embedding)) - 1 AS BIGINT) "
    " AS argmax_idx "
    "FROM embeddings",
)
def udf_map_arrow(spark, sf):
    """``mapInArrow`` — the seventh UDF flavor (SURVEY §2.5 family):
    the iterator-of-RecordBatches contract with NO pandas
    materialization between Arrow and user code. This is the right
    boundary for binary/tensor payloads (the multimodal mm_* family's
    decode path) where pandas object-boxing would dominate: columns
    arrive as Arrow buffers, numpy views them zero-copy, and the
    output batch is rebuilt column-wise.

    The computed facts are exact integers (dims, count of positive
    components, first-argmax index), so the oracle is engine-exact —
    float COMPARISONS on the same float32 values agree everywhere even
    though float SUMS would not.

    Scale shape: one Arrow-batched pass, no shuffle; the flattened
    values buffer is processed with vectorized numpy over offsets
    (never a per-row Python loop over elements)."""
    import numpy as np
    import pyarrow as pa

    def per_batch(batches):
        for b in batches:
            ids = b.column(b.schema.get_field_index("vec_id"))
            emb = b.column(b.schema.get_field_index("embedding"))
            if isinstance(emb, pa.ChunkedArray):  # pragma: no cover
                emb = emb.combine_chunks()
            offs = np.asarray(emb.offsets)
            flat = np.asarray(emb.values)
            n = len(offs) - 1
            n_dims = (offs[1:] - offs[:-1]).astype("int64")
            # segmented count-positive and argmax via reduceat over the
            # flattened buffer (empty segments impossible: dims fixed)
            pos = np.add.reduceat((flat > 0).astype("int64"), offs[:-1])
            # segmented argmax: global argsort trick not needed — use
            # maximum.reduceat for the max, then first match per segment
            seg_max = np.maximum.reduceat(flat, offs[:-1])
            is_max = flat == np.repeat(seg_max, n_dims)
            first_idx = np.zeros(n, dtype="int64")
            flat_idx = np.arange(len(flat), dtype="int64")
            big = np.where(is_max, flat_idx, np.iinfo(np.int64).max)
            first_idx = np.minimum.reduceat(big, offs[:-1]) - offs[:-1]
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(n_dims, type=pa.int64()),
                    pa.array(pos, type=pa.int64()),
                    pa.array(first_idx, type=pa.int64()),
                ],
                ["vec_id", "n_dims", "n_pos", "argmax_idx"],
            )

    from ..caching import cached_scan

    emb = cached_scan(spark, f"{sf}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    return emb.mapInArrow(
        per_batch,
        "vec_id bigint, n_dims bigint, n_pos bigint, argmax_idx bigint",
    )


@register(
    "udf_grouped_arrow",
    # applyInArrow grouped-map twin: per-label exact embedding facts
    # (group size, total dims, positive-component count) — the same
    # comparisons-only discipline as udf_map_arrow.
    "SELECT label, COUNT(*) AS n_vecs, "
    "CAST(SUM(LEN(embedding)) AS BIGINT) AS total_dims, "
    "CAST(SUM(LEN(list_filter(embedding, x -> x > 0))) AS BIGINT) AS n_pos "
    "FROM embeddings GROUP BY label",
)
def udf_grouped_arrow(spark, sf):
    """``applyInArrow`` — grouped-map in pure Arrow (the grouped
    counterpart of udf_map_arrow, completing the UDF-family matrix:
    scalar/grouped-agg/grouped-map/map-batches x pandas/Arrow). Each
    group arrives as ONE pyarrow.Table; numpy views the list-column
    buffers zero-copy; the output is one aggregate row per group.
    The right boundary when per-group tensor math would pay pandas
    object-boxing on every element.

    Exactness: group size, summed dims, and positive-component counts
    are exact integers from float32 COMPARISONS — engine-exact.

    Scale shape: one label-keyed exchange (the groupBy), then per-group
    Arrow batches; the per-group state is bounded by the label's
    vector count (balanced labels here; salting applies as for any
    grouped map at scale)."""
    import numpy as np
    import pyarrow as pa

    def per_group(tbl: "pa.Table") -> "pa.Table":
        label = tbl.column("label")[0].as_py()
        emb = tbl.column("embedding").combine_chunks()
        offs = np.asarray(emb.offsets)
        flat = np.asarray(emb.values)
        return pa.Table.from_arrays(
            [
                pa.array([label], type=pa.int32()),
                pa.array([tbl.num_rows], type=pa.int64()),
                pa.array([int(offs[-1] - offs[0])], type=pa.int64()),
                pa.array([int((flat > 0).sum())], type=pa.int64()),
            ],
            ["label", "n_vecs", "total_dims", "n_pos"],
        )

    from ..caching import cached_scan

    emb = cached_scan(spark, f"{sf}/embeddings.parquet").select(
        "label", "embedding"
    )
    return emb.groupBy("label").applyInArrow(
        per_group,
        "label int, n_vecs bigint, total_dims bigint, n_pos bigint",
    )


@register(
    "udtf_polymorphic",
    # Polymorphic UDTF: the output schema is decided by analyze() from
    # the CONSTANT argument at plan time (here: which stats columns to
    # emit). Oracle states the chosen projection directly.
    "SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars_out, "
    "CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) "
    " AS n_words FROM documents",
)
def udtf_polymorphic(spark, sf):
    """Polymorphic Python UDTF (``analyze`` static method, Spark 4):
    the table function's OUTPUT SCHEMA is computed at plan time from
    its constant arguments — here a field-list string decides which
    per-document stats columns exist. This is the schema-on-demand
    extension point (generic profilers, configurable extractors)
    that fixed-schema UDTFs cannot express; Catalyst sees the
    resolved schema, so downstream pruning works as if it were
    static.

    Scale shape: same as udtf — Arrow-batched lateral application,
    one pass, no shuffle."""
    from pyspark.sql.functions import udtf as _udtf
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")

    class DocStats:
        @staticmethod
        def analyze(doc_id, text, fields):
            from pyspark.sql.udtf import AnalyzeResult

            names = fields.value.split(",")
            return AnalyzeResult(
                StructType(
                    [StructField("doc_id", LongType())]
                    + [StructField(n, LongType()) for n in names]
                )
            )

        def eval(self, doc_id: int, text: str, fields: str):
            t = text or ""
            # compute ONLY the requested fields (r6: the unconditional
            # stats dict paid a per-character n_upper scan for a column
            # the projection never asked for)
            out = [doc_id]
            for n in fields.split(","):
                if n == "n_chars_out":
                    out.append(len(t))
                elif n == "n_words":
                    out.append(len(t.split(" ")) if t else 1)
                else:  # n_upper
                    out.append(sum(1 for ch in t if ch.isupper()))
            yield tuple(out)

    poly = _udtf(DocStats)
    spark.udtf.register("rbs_doc_stats", poly)
    # fan_out: the UDTF evaluates row-at-a-time in Python workers; the
    # one-row-group scan split would pin ALL rows to one worker
    from reach_banner_spark.fanout import fan_out

    d = fan_out(_docs(spark, sf), "doc_id")
    d.createOrReplaceTempView("rbs_docs_poly")
    return spark.sql(
        "SELECT s.doc_id, s.n_chars_out, s.n_words FROM rbs_docs_poly t, "
        "LATERAL rbs_doc_stats(t.doc_id, t.text, 'n_chars_out,n_words') s"
    )


# ------------------------------------------------------- betweenness ----

def _brandes_bc(nodes: list, adj: dict) -> dict:
    """Exact betweenness centrality (Brandes 2001) over one undirected
    graph given as a symmetric adjacency dict of SORTED neighbour
    lists; nodes iterated in sorted order, so the float accumulation
    order — hence every output bit — is fixed. Returns node -> bc
    (unordered-pair convention: directed accumulation halved)."""
    from collections import deque

    bc = {v: 0.0 for v in nodes}
    for s in nodes:
        stack = []
        pred = {v: [] for v in nodes}
        sigma = {v: 0 for v in nodes}
        dist = {v: -1 for v in nodes}
        sigma[s] = 1
        dist[s] = 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    pred[w].append(v)
        delta = {v: 0.0 for v in nodes}
        while stack:
            w = stack.pop()
            for v in pred[w]:
                delta[v] += (sigma[v] / sigma[w]) * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {v: x / 2.0 for v, x in bc.items()}


@register("kg_betweenness", None)  # == pair-sum twin, pytest-pinned
def kg_betweenness(spark, sf):
    """Exact betweenness centrality per conversation — which entities
    BROKER the graph (lie on shortest paths between others): the
    centrality that degree/PageRank miss (a low-degree cut vertex can
    carry every cross-cluster path). Brandes' algorithm is inherently
    sequential per graph, so this is the documented class-(b) custom
    operator: a grouped-map ``applyInPandas`` kernel distributed BY
    CONVERSATION — each task runs the exact O(V*E) pass over one
    conversation's entity graph (bounded by the per-conv entity
    domain, never by turns), and Spark scales across the billions of
    conversations, the 100 TB axis. Deterministic: sorted node/
    neighbour iteration fixes the float accumulation order, so output
    is bit-stable run to run (re-run pinned); pytest pins it against
    an independent pair-sum formulation (sigma_s(v)*sigma_t(v)/
    sigma_st over all pairs) within 1e-9.

    Scale shape: ONE conv_id exchange (the grouped map's) over the
    dimension-scale distinct edge set read from the materialized G7
    table; no other shuffle. Zero driver-side work."""
    e = _sym_edges(_triples_table(spark, sf)).select("conv_id", "s", "o")

    def per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        conv = pdf["conv_id"].iloc[0]
        adj: dict = {}
        for s, o in zip(pdf["s"], pdf["o"]):
            adj.setdefault(s, set()).add(o)
        nodes = sorted(adj)
        adj = {v: sorted(adj[v]) for v in nodes}
        bc = _brandes_bc(nodes, adj)
        return pd.DataFrame(
            {
                "conv_id": [conv] * len(nodes),
                "node": nodes,
                "betweenness": np.array(
                    [bc[v] for v in nodes], dtype=np.float64
                ),
            }
        )

    return e.groupBy("conv_id").applyInPandas(
        per_conv, "conv_id string, node string, betweenness double"
    )


def betweenness_pairs_py(edges: pd.DataFrame) -> pd.DataFrame:
    """Independent pair-sum betweenness twin for the golden test:
    bc(v) = sum over unordered reachable pairs {s,t} (v not in {s,t},
    with d(s,v)+d(v,t) = d(s,t)) of sigma_s(v)*sigma_t(v)/sigma_s(t) —
    a different formulation from Brandes' dependency accumulation
    (per-pair quotients summed in pair order vs back-propagated
    deltas), so agreement is a real cross-check, compared within
    tolerance because the float ADD ORDER differs. ``edges`` has
    columns (conv_id, subj, obj)."""
    from collections import deque

    out_conv, out_node, out_bc = [], [], []
    e = edges[edges["subj"] != edges["obj"]]
    for conv, grp in e.groupby("conv_id"):
        adj: dict = {}
        for s, o in zip(grp["subj"], grp["obj"]):
            adj.setdefault(s, set()).add(o)
            adj.setdefault(o, set()).add(s)
        nodes = sorted(adj)

        def bfs(src):
            dist = {src: 0}
            sigma = {src: 1}
            q = deque([src])
            while q:
                v = q.popleft()
                for w in sorted(adj[v]):
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        sigma[w] = 0
                        q.append(w)
                    if dist[w] == dist[v] + 1:
                        sigma[w] += sigma[v]
            return dist, sigma

        sp = {v: bfs(v) for v in nodes}
        bc = {v: 0.0 for v in nodes}
        for i, s in enumerate(nodes):
            ds, ss = sp[s]
            for t in nodes[i + 1 :]:
                if t not in ds:
                    continue
                dt, st = sp[t]
                d = ds[t]
                for v in nodes:
                    if v == s or v == t or v not in ds or v not in dt:
                        continue
                    if ds[v] + dt[v] == d:
                        bc[v] += ss[v] * st[v] / ss[t]
        for v in nodes:
            out_conv.append(conv)
            out_node.append(v)
            out_bc.append(bc[v])
    return pd.DataFrame(
        {"conv_id": out_conv, "node": out_node, "betweenness": out_bc}
    )


@register(
    "kg_components",
    # Component labels fall out of the SAME all-pairs table the
    # diameter/closeness family shares: the label is MIN(reachable
    # node) — the min-label closure connected_components computes
    # iteratively, here read off sp for free; comp_size is a window
    # over the dimension-sized label table. Exact strings/integers
    # only.
    _ALLPAIRS_SQL +
    ", lab AS (SELECT conv_id, src, MIN(node) AS lbl FROM sp "
    " GROUP BY 1, 2) "
    "SELECT conv_id, src AS entity, lbl AS comp_label, "
    "CAST(COUNT(*) OVER (PARTITION BY conv_id, lbl) AS BIGINT) "
    " AS comp_size FROM lab",
)
def kg_components(spark, sf):
    """Connected-component labels per entity over the strong backbone —
    which entities share a knowledge island (the structure
    ``kg_articulation`` guards and ``kg_diameter`` measures within):
    label = the minimum entity reachable from each node (the canonical
    min-label convention ``connected_components`` uses for dedup
    clusters), plus the component size. Falls out of the SHARED
    ``_strong_allpairs_dist`` table as a per-(conv, src) MIN — the
    all-pairs BFS already did the work, so the marginal cost is one
    dimension-sized aggregate and a window over the label table.
    Labels are exact under the family's ``_REACH_MAX_HOPS`` bound
    whenever component diameters stay within it (they do here —
    kg_diameter measures the max), and BOTH engines share the bound so
    the oracle equality is unconditional.

    Scale shape: identical to kg_closeness — conv_id-first shuffles
    bounded by conversations × entity domain²; the label window runs
    over the entity-domain-sized table."""
    dist = _strong_allpairs_dist(spark, sf)
    lab = dist.groupBy("conv_id", "src").agg(
        F.min("node").alias("comp_label")
    )
    w = Window.partitionBy("conv_id", "comp_label")
    return lab.select(
        "conv_id",
        F.col("src").alias("entity"),
        "comp_label",
        F.count(F.lit(1)).over(w).cast("long").alias("comp_size"),
    )


@register(
    "kg_eccentricity",
    # Eccentricity / radius / center fall out of the SAME all-pairs
    # table as the diameter/closeness/components family: ecc = MAX(d)
    # per source, radius = MIN(ecc) per conversation (a window over the
    # dimension-sized ecc table), is_center = exact integer equality.
    # No float anywhere.
    _ALLPAIRS_SQL +
    ", ecc AS (SELECT conv_id, src, MAX(d) AS e FROM sp GROUP BY 1, 2) "
    "SELECT conv_id, src AS entity, CAST(e AS INT) AS eccentricity, "
    "CAST(MIN(e) OVER (PARTITION BY conv_id) AS INT) AS radius, "
    "e = MIN(e) OVER (PARTITION BY conv_id) AS is_center "
    "FROM ecc",
)
def kg_eccentricity(spark, sf):
    """Per-entity eccentricity over the strong-edge backbone — the
    worst-case hop distance from each entity to anything it can reach —
    plus the conversation's radius (minimum eccentricity) and the
    center flag (eccentricity == radius). The fourth rollup of the
    shared all-pairs BFS family: ``kg_diameter`` reads its MAX,
    ``kg_closeness`` its SUM, ``kg_components`` its MIN-label, this key
    its per-source MAX — the center entities are where a KG UI anchors
    a conversation's layout and where a cache places the hub rows.
    Everything is exact integers off the memoized distance table; the
    center flag is an integer equality, so no float ever decides it.

    Scale shape: reuses ``_strong_allpairs_dist`` (memoized per corpus
    — the BFS runs once for the whole family); the rollup is one
    (conv_id, src) aggregate and the radius window runs over the
    entity-domain-sized eccentricity table, conv_id-partitioned."""
    dist = _strong_allpairs_dist(spark, sf)
    ecc = dist.groupBy("conv_id", "src").agg(
        F.max("d").cast("int").alias("eccentricity")
    )
    w = Window.partitionBy("conv_id")
    return ecc.select(
        "conv_id",
        F.col("src").alias("entity"),
        "eccentricity",
        F.min("eccentricity").over(w).cast("int").alias("radius"),
        (F.col("eccentricity") == F.min("eccentricity").over(w)).alias(
            "is_center"
        ),
    )


# Directed-strong-edge memo (kg_scc): same discipline as _STRONG_MEMO —
# the directed backbone is its own checkpointed edge set because the
# direction-collapsing LEAST/GREATEST canonicalization of
# _strong_canon_edges erases exactly the asymmetry SCC needs.
_DIR_MEMO: dict = {}


def _strong_dir_edges_cached(spark, sf) -> DataFrame:
    """Memoized DIRECTED strong edges (conv_id, s, o): subj->obj pairs
    whose support is strictly above their conversation's mean directed
    support (n * n_edges > total — the kg_diameter exact-integer cut,
    applied to the directed pair table instead of the canonicalized
    one)."""
    memo_key = (
        spark.sparkContext.applicationId,
        sf,
        _TRIPLES_TABLE_VERSION,
    )
    cached = _DIR_MEMO.get(memo_key)
    if cached is None:
        t = _triples_table(spark, sf)
        dp = t.groupBy(
            "conv_id",
            F.col("subj").alias("s"),
            F.col("obj").alias("o"),
        ).agg(F.count(F.lit(1)).alias("n"))
        st = dp.groupBy("conv_id").agg(
            F.sum("n").alias("tot"), F.count(F.lit(1)).alias("ne")
        )
        cached = (
            dp.join(st, "conv_id")
            .where(F.col("n") * F.col("ne") > F.col("tot"))
            .select("conv_id", "s", "o")
            .localCheckpoint()
        )
        _DIR_MEMO[memo_key] = cached
    return cached


@register(
    "kg_scc",
    # Strongly connected components over the DIRECTED strong backbone.
    # The oracle is the DEFINITION: an UNBOUNDED recursive reachability
    # closure (UNION dedups, so it terminates at the fixpoint — the
    # kg_articulation lesson: never hop-bound a closure an algorithm
    # depends on), then label = MIN over the mutually-reachable set.
    # The Spark side is Tarjan — algorithm vs definition cross-check.
    f"WITH RECURSIVE t AS ({_TRIPLES_SQL}), "
    "dp AS (SELECT conv_id, subj AS s, obj AS o, COUNT(*) AS n FROM t "
    " GROUP BY 1, 2, 3), "
    "dst AS (SELECT conv_id, SUM(n) AS tot, COUNT(*) AS ne FROM dp "
    " GROUP BY 1), "
    "de AS (SELECT dp.conv_id, s, o FROM dp JOIN dst USING (conv_id) "
    " WHERE dp.n * dst.ne > dst.tot), "
    "nodes AS (SELECT conv_id, s AS node FROM de "
    " UNION SELECT conv_id, o FROM de), "
    "r(conv_id, src, node) AS ("
    " SELECT conv_id, node, node FROM nodes "
    " UNION "
    " SELECT de.conv_id, r.src, de.o FROM r JOIN de "
    "  ON de.conv_id = r.conv_id AND de.s = r.node), "
    "scc AS (SELECT f.conv_id, f.src AS entity, MIN(f.node) AS lbl "
    " FROM r f JOIN r b ON b.conv_id = f.conv_id AND b.src = f.node "
    "  AND b.node = f.src GROUP BY 1, 2) "
    "SELECT conv_id, entity, lbl AS scc_label, "
    "CAST(COUNT(*) OVER (PARTITION BY conv_id, lbl) AS BIGINT) "
    " AS scc_size FROM scc",
)
def kg_scc(spark, sf):
    """Strongly connected components per conversation over the DIRECTED
    strong backbone — which entity groups refer back to each other
    (mutual asked_about/answered_with cycles) versus flowing one way.
    The directed complement of ``kg_components``: an undirected
    component can be a chain of one-way references, an SCC cannot —
    cyclic cores are where a KG's facts reinforce each other and where
    contradiction checks (``kg_pred_conflicts``) matter most. Labels
    follow the min-label convention (label = smallest entity in the
    SCC), plus the SCC size.

    Correctness is an algorithm-vs-definition cross-check: the DuckDB
    oracle computes the UNBOUNDED recursive reachability closure and
    takes MIN over each node's mutually-reachable set (the definition);
    this side runs iterative Tarjan per conversation — a one-pass
    linear-time algorithm that must produce the identical partition.

    Scale shape: the class-(b) grouped-map kernel pattern
    (kg_mst/kg_betweenness discipline) — SCC is sequential per graph,
    so ONE conv_id exchange over the memoized checkpointed directed
    edge set feeds one ``applyInPandas`` task per conversation; O(V+E)
    per graph, bounded by the entity domain, distributed across
    conversations. All-string/integer output — no float anywhere."""
    de = _strong_dir_edges_cached(spark, sf)

    def per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        conv = pdf["conv_id"].iloc[0]
        adj: dict = {}
        nodes = set()
        for s, o in zip(pdf["s"], pdf["o"]):
            nodes.add(s)
            nodes.add(o)
            adj.setdefault(s, []).append(o)
        for v in adj:
            adj[v].sort()
        index: dict = {}
        low: dict = {}
        on: set = set()
        stack: list = []
        comp: dict = {}
        counter = 0
        for root in sorted(nodes):
            if root in index:
                continue
            index[root] = low[root] = counter
            counter += 1
            stack.append(root)
            on.add(root)
            work = [(root, iter(adj.get(root, [])))]
            while work:
                v, it = work[-1]
                advanced = False
                for w in it:
                    if w not in index:
                        index[w] = low[w] = counter
                        counter += 1
                        stack.append(w)
                        on.add(w)
                        work.append((w, iter(adj.get(w, []))))
                        advanced = True
                        break
                    if w in on and index[w] < low[v]:
                        low[v] = index[w]
                if advanced:
                    continue
                work.pop()
                if work and low[v] < low[work[-1][0]]:
                    low[work[-1][0]] = low[v]
                if low[v] == index[v]:
                    scc = []
                    while True:
                        w = stack.pop()
                        on.discard(w)
                        scc.append(w)
                        if w == v:
                            break
                    lbl = min(scc)
                    for w in scc:
                        comp[w] = lbl
        from collections import Counter as _Counter

        sizes = _Counter(comp.values())
        ents = sorted(comp)
        return pd.DataFrame(
            {
                "conv_id": [conv] * len(ents),
                "entity": ents,
                "scc_label": [comp[e] for e in ents],
                "scc_size": [sizes[comp[e]] for e in ents],
            }
        )

    return de.groupBy("conv_id").applyInPandas(
        per_conv,
        "conv_id string, entity string, scc_label string, scc_size long",
    )


@register("kg_mst", None)  # == Prim twin, pytest-pinned
def kg_mst(spark, sf):
    """Maximum-support spanning forest per conversation — the minimal
    edge set that keeps every knowledge island connected through its
    STRONGEST co-occurrence links: the backbone-of-the-backbone a KG
    visualizer draws and the skeleton hierarchical clustering cuts.
    Kruskal's algorithm under the TOTAL edge order (support DESC, a, b)
    — with all ties broken, the perturbed weights are distinct, so the
    maximum spanning forest is UNIQUE and any correct algorithm must
    produce the identical edge set (the pytest Prim twin exploits
    exactly this: a different algorithm, same unique answer — plus the
    forest invariant |edges| = |nodes| - |components| against
    kg_components). Same class-(b) kernel pattern as
    kg_bridges/kg_betweenness: union-find is sequential per graph, so
    one grouped-map ``applyInPandas`` task runs one conversation and
    Spark distributes across conversations.

    Scale shape: ONE conv_id exchange over the dimension-scale
    weighted strong edge set; O(E log E) per conversation, bounded by
    the entity domain. All-integer output (support weights are exact
    co-occurrence counts)."""
    strong = _strong_edges_cached(spark, sf).select(
        "conv_id", "a", "b", "n"
    )

    def per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        conv = pdf["conv_id"].iloc[0]
        edges = sorted(
            (
                (int(n), a, b)
                for a, b, n in zip(pdf["a"], pdf["b"], pdf["n"])
                if a != b
            ),
            key=lambda t: (-t[0], t[1], t[2]),
        )
        parent: dict = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        keep = []
        for n, a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
                keep.append((a, b, n))
        keep.sort()
        return pd.DataFrame(
            {
                "conv_id": [conv] * len(keep),
                "a": [a for a, _, _ in keep],
                "b": [b for _, b, _ in keep],
                "w": [n for _, _, n in keep],
            }
        )

    return strong.groupBy("conv_id").applyInPandas(
        per_conv, "conv_id string, a string, b string, w long"
    )


def _stage_corrupt_csv(sf: str) -> tuple[str, int]:
    """Stage a bounded CSV slice (doc_id < 100) where every
    doc_id % 7 == 3 row is TYPE-malformed (full arity, unparseable
    numerics — arity-malformed rows are not flagged corrupt by Spark's
    CSV reader, type failures are). Returns (path, n_corrupt staged).
    Content derives from the documents table, so the oracle states the
    expected surviving rows FROM THE TABLE and never depends on any
    CSV semantics of the oracle engine (the _stage_binary trick).
    Cache is CONTENT-fingerprinted (the _staged_doc_stream_dir
    discipline — regenerated parquet must never reuse a stale slice)
    and the staged n_bad rides a sidecar so the warm path never
    re-reads the parquet (r5 session-12 review findings)."""
    import os
    import tempfile

    from ..tmputil import source_fingerprint

    src = f"{sf}/documents.parquet"
    out = os.path.join(
        tempfile.gettempdir(), f"rbs_csvbad_{source_fingerprint(src)}"
    )
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        import duckdb

        con = duckdb.connect()
        rows = con.execute(
            f"SELECT doc_id, lang, n_chars FROM read_parquet('{src}') "
            "WHERE doc_id < 100 ORDER BY doc_id"
        ).fetchall()
        n_bad = sum(1 for r in rows if r[0] % 7 == 3)
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "part.csv"), "w") as f:
            f.write("doc_id,lang,n_chars\n")
            for doc_id, lang, n_chars in rows:
                if doc_id % 7 == 3:
                    f.write(f"notanumber_{doc_id},{lang},alsobad\n")
                else:
                    f.write(f"{doc_id},{lang},{n_chars}\n")
        open(marker, "w").write(str(n_bad))
    return out, int(open(marker).read())


@register(
    "source_csv_corrupt",
    # The oracle states the EXPECTED survivors from the parquet table
    # (doc_id % 7 == 3 rows were staged malformed) — no dependence on
    # the oracle engine's own CSV error semantics.
    "SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars "
    "FROM documents WHERE doc_id < 100 AND doc_id % 7 <> 3",
)
def source_csv_corrupt(spark, sf):
    """Malformed-record CSV ingestion — the robustness surface every
    production ingest needs: PERMISSIVE mode with a
    ``columnNameOfCorruptRecord`` column, so type-malformed rows are
    captured (raw line preserved for quarantine) instead of failing
    the job, and clean rows flow through untouched. This key emits
    the CLEAN side (oracled against the staged corruption rule);
    pytest pins the quarantine side — exactly the staged corrupt rows
    are flagged with their raw lines intact.

    Scale shape: a single-pass schema-on-read scan; the corrupt-record
    column is populated by the parser itself (no second pass, no
    driver involvement) — at 100 TB the quarantine split is a free
    byproduct of the scan."""
    path, _ = _stage_corrupt_csv(sf)
    raw = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema("doc_id long, lang string, n_chars long, _corrupt string")
        .csv(path)
    )
    return raw.where(F.col("_corrupt").isNull()).select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "udf_scalar_iter",
    # Same relation as udf_scalar_pandas — the iterator flavor must be
    # semantically transparent; the oracle is the regex spelling.
    "SELECT doc_id, REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE("
    "source, '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'), '[0-9]', '0', 'g') "
    "AS src_shape FROM documents",
)
def udf_scalar_iter(spark, sf):
    """Iterator-of-Series pandas UDF (SCALAR_ITER) — the last member of
    the UDF taxonomy (scalar, grouped-agg, grouped-map, map-batches,
    arrow-optimized, map/grouped Arrow, UDTFs are already on the
    surface): the UDF receives an ITERATOR over Arrow batches, letting
    expensive per-task setup (model load, dictionary build) run ONCE
    per executor task instead of once per batch — the production shape
    for UDFs with heavy initialization. Here the one-time setup is the
    word-shape vectorizer import; the per-batch body is identical to
    udf_scalar_pandas, and the oracle pins that the iterator plumbing
    is semantically transparent.

    Scale shape: same zero-shuffle Arrow-batched projection as the
    scalar flavor; the iterator form amortizes setup over every batch
    a task processes (at 100 TB: thousands of batches per task, one
    setup)."""
    from typing import Iterator  # literal hint name drives eval-type inference

    @F.pandas_udf("string")
    def shape_iter_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # one-time per-task setup amortized across all batches
        from ..operators.features import word_shape

        for s in it:
            yield pd.Series(word_shape(s.to_numpy()), dtype="object")

    d = _docs(spark, sf)
    return d.select("doc_id", shape_iter_udf("source").alias("src_shape"))


@register(
    "kg_conv_similarity",
    # Conversation-pair entity-set Jaccard: exact integer intersection
    # and set sizes, one ROUND/%.6f division; every pair sharing >= 1
    # entity (convs are dictionary-bounded, so the pair table is tiny).
    f"WITH t AS ({_TRIPLES_SQL}), "
    "ce AS (SELECT DISTINCT conv_id, subj AS e FROM t "
    " UNION SELECT DISTINCT conv_id, obj FROM t), "
    "n AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS ne FROM ce "
    " GROUP BY 1), "
    "p AS (SELECT a.conv_id AS ca, b.conv_id AS cb, "
    " CAST(COUNT(*) AS BIGINT) AS inter FROM ce a JOIN ce b "
    " ON a.e = b.e AND a.conv_id < b.conv_id GROUP BY 1, 2) "
    "SELECT ca, cb, inter, na.ne AS na, nb.ne AS nb, "
    "printf('%.6f', ROUND(CAST(inter AS DOUBLE) "
    " / (na.ne + nb.ne - inter), 6)) AS jaccard "
    "FROM p JOIN n na ON na.conv_id = p.ca "
    "JOIN n nb ON nb.conv_id = p.cb",
)
def kg_conv_similarity(spark, sf):
    """Conversation-level topical similarity — which conversations talk
    about the same things: entity-set Jaccard for every conversation
    pair sharing at least one entity. The KG consumption query behind
    cross-conversation retrieval ("find me the other threads about
    these entities") and corpus-level redundancy audits; the graph
    dual of ``dedup_ngram_jaccard`` (token sets per document there,
    entity sets per conversation here).

    Float discipline: intersection and set sizes are exact BIGINTs
    from distinct-aggregations; |A∪B| = na + nb - inter is exact; the
    ratio is ONE correctly-rounded IEEE division under ROUND/%.6f.

    Scale shape: the per-conv entity sets are dictionary-bounded, so
    the entity-keyed self-join is bounded by entity-domain ×
    convs-per-entity² — at a billion conversations this pairs only
    conversations SHARING an entity (the join key prunes the cross
    product exactly the way an inverted index would), and the
    pair-level rollup is dimension-sized."""
    t = _triples_table(spark, sf)
    ce = (
        t.select("conv_id", F.col("subj").alias("e"))
        .union(t.select("conv_id", F.col("obj").alias("e")))
        .distinct()
        .localCheckpoint()
    )
    n = ce.groupBy("conv_id").agg(F.count(F.lit(1)).cast("long").alias("ne"))
    a = ce.select(F.col("conv_id").alias("ca"), "e")
    b = ce.select(F.col("conv_id").alias("cb"), "e")
    p = (
        a.join(b, "e")
        .where(F.col("ca") < F.col("cb"))
        .groupBy("ca", "cb")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    na = n.select(F.col("conv_id").alias("ca"), F.col("ne").alias("na"))
    nb = n.select(F.col("conv_id").alias("cb"), F.col("ne").alias("nb"))
    return (
        p.join(F.broadcast(na), "ca")
        .join(F.broadcast(nb), "cb")
        .select(
            "ca",
            "cb",
            "inter",
            "na",
            "nb",
            F.format_string(
                "%.6f",
                F.round(
                    F.col("inter").cast("double")
                    / (F.col("na") + F.col("nb") - F.col("inter")),
                    6,
                ),
            ).alias("jaccard"),
        )
    )


@register(
    "macro_graph_health",
    # One row per conversation composing the graph-structure family
    # off the SHARED definitions: all-pairs stats (n_nodes/diameter),
    # min-label component count, strong-edge count, and the
    # per-edge-removal bridge count — all exact integers. The oracle
    # runs BOTH recursions (all-pairs + bridge removal) in one
    # WITH RECURSIVE (renamed rb to avoid colliding with r).
    _ALLPAIRS_SQL +
    ", rb(conv_id, ea, eb, node) AS ("
    " SELECT conv_id, a, b, a FROM sp0 "
    " UNION "
    " SELECT rb.conv_id, rb.ea, rb.eb, e.o FROM rb JOIN e "
    "  ON e.conv_id = rb.conv_id AND e.s = rb.node "
    "  WHERE NOT (LEAST(e.s, e.o) = rb.ea AND GREATEST(e.s, e.o) = rb.eb)), "
    "br AS (SELECT s.conv_id, CAST(COUNT(*) AS BIGINT) AS n_bridges "
    " FROM sp0 s LEFT JOIN rb ON rb.conv_id = s.conv_id "
    "  AND rb.ea = s.a AND rb.eb = s.b AND rb.node = s.b "
    " WHERE rb.node IS NULL GROUP BY 1), "
    "lab AS (SELECT conv_id, src, MIN(node) AS lbl FROM sp GROUP BY 1, 2), "
    "cc AS (SELECT conv_id, CAST(COUNT(DISTINCT lbl) AS BIGINT) "
    " AS n_comps FROM lab GROUP BY 1), "
    "ed AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_edges "
    " FROM sp0 WHERE a <> b GROUP BY 1), "
    "dia AS (SELECT conv_id, CAST(COUNT(DISTINCT src) AS BIGINT) "
    " AS n_nodes, CAST(MAX(d) AS INT) AS diameter FROM sp GROUP BY 1) "
    "SELECT dia.conv_id, n_nodes, COALESCE(ed.n_edges, 0) AS n_edges, "
    "n_comps, diameter, COALESCE(br.n_bridges, 0) AS n_bridges "
    "FROM dia JOIN cc ON cc.conv_id = dia.conv_id "
    "LEFT JOIN ed ON ed.conv_id = dia.conv_id "
    "LEFT JOIN br ON br.conv_id = dia.conv_id",
)
def macro_graph_health(spark, sf):
    """Per-conversation graph health profile — the one-row-per-graph
    report a KG operations dashboard publishes (the graph-structure
    sibling of ``macro_kg_report``): node/edge counts, connected
    components, diameter, and bridge count over the strong backbone,
    every column composed from the family's SHARED definitions (the
    memoized all-pairs BFS feeds the node/diameter/component columns;
    the ``kg_bridges`` kernel feeds the robustness column; the
    canonical strong edge set feeds the edge count). High bridge count
    with low diameter = a hub-and-spoke graph one fact from
    fragmenting; n_comps > 1 = the conversation's knowledge never
    connected.

    Scale shape: every input is conversation-keyed and
    dimension-sized; the macro itself is four conv_id-keyed joins over
    tables bounded by conversations × entity domain. All-integer
    output (no floats anywhere).

    The oracle is the family's two recursions composed in one
    WITH RECURSIVE — a green row pins the COMPOSITION, not just the
    parts (cross-family consistency the per-key oracles can't see)."""
    dist = _strong_allpairs_dist(spark, sf)
    strong = _strong_edges_cached(spark, sf)
    dia = dist.groupBy("conv_id").agg(
        F.countDistinct("src").alias("n_nodes"),
        F.max("d").cast("int").alias("diameter"),
    )
    cc = (
        dist.groupBy("conv_id", "src")
        .agg(F.min("node").alias("lbl"))
        .groupBy("conv_id")
        .agg(F.countDistinct("lbl").alias("n_comps"))
    )
    ed = (
        strong.where(F.col("a") != F.col("b"))
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )
    br = (
        kg_bridges(spark, sf)
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_bridges"))
    )
    return (
        dia.join(cc, "conv_id")
        .join(ed, "conv_id", "left")
        .join(br, "conv_id", "left")
        .select(
            "conv_id",
            "n_nodes",
            F.coalesce(F.col("n_edges"), F.lit(0)).cast("long").alias(
                "n_edges"
            ),
            "n_comps",
            "diameter",
            F.coalesce(F.col("n_bridges"), F.lit(0)).cast("long").alias(
                "n_bridges"
            ),
        )
    )


@register(
    "kg_path_length_dist",
    # Hop-plot over the SAME all-pairs BFS table as kg_diameter
    # (shared _ALLPAIRS_SQL recursion), pooled across conversations:
    # per hop distance the reachable-pair count, its cumulative count,
    # and the 90%-effective-diameter flag — the cut is the exact
    # integer cross-multiply cum*10 >= total*9 (first d where it
    # holds), so the non-dyadic 0.9 never decides; cum_share is ONE
    # IEEE division under ROUND + %.6f.
    _ALLPAIRS_SQL + ", pg AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n_pairs "
    " FROM sp WHERE src <> node GROUP BY d), "
    "ptot AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS total FROM pg), "
    "pc AS (SELECT d, n_pairs, CAST(SUM(n_pairs) OVER (ORDER BY d "
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum "
    " FROM pg) "
    "SELECT CAST(d AS INT) AS d, n_pairs, cum AS cum_pairs, "
    "printf('%.6f', ROUND(CAST(cum AS DOUBLE) / total, 6)) AS cum_share, "
    "(cum * 10 >= total * 9 AND (cum - n_pairs) * 10 < total * 9) "
    " AS eff_diameter_90 FROM pc, ptot",
)
def kg_path_length_dist(spark, sf):
    """Hop plot of the knowledge graph: the distribution of shortest-
    path lengths over all reachable entity pairs (pooled across
    conversations, strong-edge backbone), with the 90% effective
    diameter flagged — the standard small-world readout next to
    ``kg_diameter``'s per-conversation max (the max is an outlier
    statistic; the hop distribution is what navigation latency
    actually depends on, cf. the ANF/hop-plot literature).

    Float discipline: pair counts and cumulative counts are exact
    integers off the shared all-pairs BFS table; the effective-
    diameter-90 flag is an exact integer cross-multiplication
    (cum*10 >= total*9, with the previous row strictly below), so the
    non-dyadic 0.9 threshold never touches a float; cum_share is ONE
    correctly-rounded IEEE division under ROUND + %.6f.

    Scale shape: reuses the memoized ``_strong_allpairs_dist`` table
    (zero extra BFS cost after any sibling key ran); the rollup is a
    hop-bounded dimension table (<= _REACH_MAX_HOPS rows), one ordered
    window and a 1x1 total join finish it."""
    dist = _strong_allpairs_dist(spark, sf).filter(
        F.col("src") != F.col("node")
    )
    g = dist.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    t = g.agg(F.sum("n_pairs").cast("long").alias("total"))
    wcum = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = g.select(
        "d",
        "n_pairs",
        F.sum("n_pairs").over(wcum).cast("long").alias("cum"),
    )
    return c.crossJoin(F.broadcast(t)).select(
        F.col("d").cast("int").alias("d"),
        "n_pairs",
        F.col("cum").alias("cum_pairs"),
        F.format_string(
            "%.6f",
            F.round(F.col("cum").cast("double") / F.col("total"), 6),
        ).alias("cum_share"),
        (
            (F.col("cum") * 10 >= F.col("total") * 9)
            & ((F.col("cum") - F.col("n_pairs")) * 10 < F.col("total") * 9)
        ).alias("eff_diameter_90"),
    )


def _truss_decompose(edges):
    """Truss decomposition of a simple undirected graph (canonical
    (a, b) edges, a < b, no self-loops): returns {edge: trussness}
    where trussness(e) is the largest k such that e survives the
    k-truss (every edge in at least k-2 triangles within the
    subgraph). Standard support-peeling (Wang & Cheng 2012): peel the
    minimum-support edge, decrementing the supports of the two edges
    it shares each live triangle with. The output MAP is a graph
    invariant — independent of peel tie order — but ties peel in
    sorted edge order anyway (repo determinism rule)."""
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    live = {e: None for e in sorted(edges)}
    sup = {
        (a, b): len(adj[a] & adj[b]) for a, b in live
    }
    out: dict = {}
    k = 2
    while live:
        # peel every edge whose support can no longer reach k-1
        queue = sorted(e for e in live if sup[e] <= k - 2)
        if not queue:
            k += 1
            continue
        while queue:
            e = queue.pop(0)
            if e not in live:
                continue
            a, b = e
            for c in sorted(adj[a] & adj[b]):
                for f in ((min(a, c), max(a, c)), (min(b, c), max(b, c))):
                    if f in live:
                        sup[f] -= 1
                        if sup[f] <= k - 2:
                            queue.append(f)
            del live[e]
            adj[a].discard(b)
            adj[b].discard(a)
            out[e] = k
    return out


@register("kg_k_truss", None)  # pytest: == fixed-point definition twin
def kg_k_truss(spark, sf):
    """Truss decomposition per conversation over the strong backbone:
    each edge's TRUSSNESS — the largest k for which it survives the
    k-truss (the maximal subgraph where every edge closes at least
    k-2 triangles). The standard cohesive-subgraph ladder one level
    above ``kg_kcore`` (cores constrain node degree; trusses constrain
    edge TRIANGLE support, so a k-truss is always denser than the
    corresponding core — the community-keeping prune a production KG
    runs before exposing 'tightly corroborated' fact clusters).

    Support-peeling is inherently sequential per graph (each peel
    changes its neighbours' supports), so this is the class-(b)
    custom-operator pattern (``kg_bridges`` precedent): a grouped-map
    ``applyInPandas`` kernel peels ONE conversation's canonical edge
    list, Spark distributes across conversations — the 100 TB axis.
    All-integer (no floats anywhere); the trussness map is a graph
    invariant regardless of peel order, and ties peel in sorted edge
    order anyway. No SQL oracle — iterated peeling to a fixed point is
    not expressible in one (even recursive) query; the pytest twin
    re-derives trussness from the DEFINITION (per-k fixed-point edge
    deletion — a different formulation, so agreement is an algorithmic
    cross-check) plus a handcrafted clique-plus-tail case.

    Scale shape: ONE conv_id exchange (the grouped map's) over the
    dimension-scale strong edge set; per-task cost is O(E^1.5)-ish,
    bounded by the per-conv entity domain, never by turns."""
    strong = _strong_edges_cached(spark, sf).select("conv_id", "a", "b")

    def per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        conv = pdf["conv_id"].iloc[0]
        edges = sorted(
            {
                (a, b)
                for a, b in zip(pdf["a"], pdf["b"])
                if a != b
            }
        )
        tr = _truss_decompose(edges)
        items = sorted(tr.items())
        return pd.DataFrame(
            {
                "conv_id": [conv] * len(items),
                "a": [e[0] for e, _ in items],
                "b": [e[1] for e, _ in items],
                "trussness": [int(t) for _, t in items],
            }
        )

    return strong.groupBy("conv_id").applyInPandas(
        per_conv, "conv_id string, a string, b string, trussness int"
    )


@register(
    "kg_shortest_path",
    # Point-to-point shortest path WITH path reconstruction between
    # each conversation's two highest-degree entities (degree DESC,
    # name tie-break) over the strong backbone: single-source BFS from
    # src (the kg_reach recursion), deterministic predecessor =
    # MIN(neighbor at d-1), and a backtracking recursion that builds
    # the comma-joined node chain — every choice an integer/lexical
    # MIN, no float anywhere. Unreachable pairs are excluded on both
    # engines (inner joins).
    f"WITH RECURSIVE t AS ({_TRIPLES_SQL}), "
    f"{_STRONG_SQL}, "
    "deg AS (SELECT conv_id, s AS node, COUNT(*) AS dg FROM e "
    " GROUP BY 1, 2), "
    "pick AS (SELECT conv_id, node, ROW_NUMBER() OVER ("
    " PARTITION BY conv_id ORDER BY dg DESC, node) AS rn FROM deg), "
    "se AS (SELECT conv_id, MAX(CASE WHEN rn = 1 THEN node END) AS src, "
    " MAX(CASE WHEN rn = 2 THEN node END) AS dst FROM pick WHERE rn <= 2 "
    " GROUP BY conv_id HAVING COUNT(*) = 2), "
    "r(conv_id, node, d) AS ("
    " SELECT conv_id, src, 0 FROM se "
    " UNION "
    " SELECT e.conv_id, e.o, r.d + 1 FROM r JOIN e "
    f"  ON e.conv_id = r.conv_id AND e.s = r.node WHERE r.d < {_REACH_MAX_HOPS}), "
    "spd AS (SELECT conv_id, node, MIN(d) AS d FROM r GROUP BY 1, 2), "
    "par AS (SELECT c.conv_id, c.node, MIN(e.s) AS parent FROM spd c "
    " JOIN e ON e.conv_id = c.conv_id AND e.o = c.node "
    " JOIN spd p ON p.conv_id = c.conv_id AND p.node = e.s "
    "  AND p.d = c.d - 1 GROUP BY c.conv_id, c.node), "
    "bt(conv_id, node, path) AS ("
    " SELECT se.conv_id, se.dst, se.dst FROM se JOIN spd "
    "  ON spd.conv_id = se.conv_id AND spd.node = se.dst "
    " UNION ALL "
    " SELECT bt.conv_id, par.parent, par.parent || ',' || bt.path "
    " FROM bt JOIN par ON par.conv_id = bt.conv_id "
    "  AND par.node = bt.node) "
    "SELECT se.conv_id, se.src, se.dst, CAST(spd.d AS INT) AS dist, "
    "bt.path FROM se "
    "JOIN spd ON spd.conv_id = se.conv_id AND spd.node = se.dst "
    "JOIN bt ON bt.conv_id = se.conv_id AND bt.node = se.src",
)
def kg_shortest_path(spark, sf):
    """Point-to-point shortest path WITH the actual path — between
    each conversation's two highest-degree entities (the pair a KG
    browser most often asks to connect), over the strong backbone.
    Every distance key so far emits hop COUNTS; this one reconstructs
    the node chain itself — the 'how are these two related' answer a
    KG UI renders — via deterministic predecessors: parent(v) = the
    lexicographically smallest neighbor of v at distance d(v)-1, so
    among all shortest paths both engines pick the same one without
    any float or random tie-break.

    Scale shape: degree pick and BFS run per conversation over the
    cached strong edge set (entity-domain bounded); the BFS is the
    kg_reach fixed-iteration frontier loop (zero in-loop driver
    barriers, localCheckpoint per round); parent derivation is one
    self-join of the distance table with the edge set; backtracking
    iterates at most ``_REACH_MAX_HOPS`` single-row-per-conv joins.
    Unreachable or degenerate (<2 node) conversations are excluded by
    inner joins on both engines."""
    strong = _strong_edges_cached(spark, sf)
    e = (
        strong.select("conv_id", F.col("a").alias("s"), F.col("b").alias("o"))
        .union(
            strong.select(
                "conv_id", F.col("b").alias("s"), F.col("a").alias("o")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    deg = e.groupBy("conv_id", F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("dg")
    )
    wpick = Window.partitionBy("conv_id").orderBy(
        F.desc("dg"), F.asc("node")
    )
    pick = deg.select(
        "conv_id", "node", F.row_number().over(wpick).alias("rn")
    ).filter(F.col("rn") <= 2)
    se = (
        pick.groupBy("conv_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("node"))).alias("src"),
            F.max(F.when(F.col("rn") == 2, F.col("node"))).alias("dst"),
            F.count(F.lit(1)).alias("npick"),
        )
        .filter(F.col("npick") == 2)
        .drop("npick")
        .localCheckpoint()
    )
    dist = se.select(
        "conv_id", F.col("src").alias("node")
    ).withColumn("d", F.lit(0)).localCheckpoint()
    frontier = dist
    for d in range(1, _REACH_MAX_HOPS + 1):
        fr = frontier.select(
            F.col("conv_id").alias("f_conv"), F.col("node").alias("f_node")
        )
        reached = fr.join(
            e,
            (F.col("f_conv") == F.col("conv_id"))
            & (F.col("f_node") == F.col("s")),
        ).select("conv_id", F.col("o").alias("node"))
        fresh = (
            reached.distinct()
            .join(dist.select("conv_id", "node"), ["conv_id", "node"], "left_anti")
            .withColumn("d", F.lit(d))
            .localCheckpoint()
        )
        dist = dist.unionByName(fresh)
        frontier = fresh
    dist = dist.localCheckpoint()
    dm1 = dist.select(
        F.col("conv_id").alias("p_conv"),
        F.col("node").alias("p_node"),
        F.col("d").alias("p_d"),
    )
    par = (
        dist.join(
            e.select(
                F.col("conv_id").alias("e_conv"), "s", F.col("o").alias("e_o")
            ),
            (F.col("e_conv") == F.col("conv_id"))
            & (F.col("e_o") == F.col("node")),
        )
        .join(
            dm1,
            (F.col("p_conv") == F.col("conv_id"))
            & (F.col("p_node") == F.col("s"))
            & (F.col("p_d") == F.col("d") - 1),
        )
        .groupBy("conv_id", "node")
        .agg(F.min("s").alias("parent"))
        .localCheckpoint()
    )
    # backtrack: walk parents from dst; a row is DONE when it reaches src
    walk = (
        se.join(
            dist.select("conv_id", F.col("node").alias("dst"), "d"),
            ["conv_id", "dst"],
        )
        .select("conv_id", "src", "dst", F.col("d").alias("dist"),
                F.col("dst").alias("cur"), F.col("dst").alias("path"))
        .localCheckpoint()
    )
    for _ in range(_REACH_MAX_HOPS):
        done = walk.filter(F.col("cur") == F.col("src"))
        todo = walk.filter(F.col("cur") != F.col("src"))
        stepped = todo.join(
            par.select(
                F.col("conv_id").alias("w_conv"),
                F.col("node").alias("w_node"),
                "parent",
            ),
            (F.col("w_conv") == F.col("conv_id"))
            & (F.col("w_node") == F.col("cur")),
        ).select(
            "conv_id", "src", "dst", "dist",
            F.col("parent").alias("cur"),
            F.concat_ws(",", F.col("parent"), F.col("path")).alias("path"),
        )
        walk = done.unionByName(stepped).localCheckpoint()
    return walk.filter(F.col("cur") == F.col("src")).select(
        "conv_id", "src", "dst", F.col("dist").cast("int").alias("dist"),
        "path",
    )


# --------------------------------------------------- directed motif census --

@register(
    "kg_motif_census",
    # Directed triad census over the DISTINCT conv-scoped directed edge
    # set (predicates collapsed): open two-paths a->b->c, transitive
    # triangles (a->b, b->c, a->c — the feed-forward motif), and directed
    # 3-cycles counted once via the min-node rotation anchor. All exact
    # integer counts.
    f"WITH t AS ({_TRIPLES_SQL}), "
    "e AS (SELECT DISTINCT conv_id, subj AS s, obj AS o FROM t "
    " WHERE subj <> obj), "
    "tp AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM e ab "
    " JOIN e bc ON bc.conv_id = ab.conv_id AND bc.s = ab.o "
    " WHERE bc.o <> ab.s), "
    "tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM e ab "
    " JOIN e bc ON bc.conv_id = ab.conv_id AND bc.s = ab.o "
    " JOIN e ac ON ac.conv_id = ab.conv_id AND ac.s = ab.s "
    "  AND ac.o = bc.o "
    " WHERE bc.o <> ab.s), "
    "cy AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM e ab "
    " JOIN e bc ON bc.conv_id = ab.conv_id AND bc.s = ab.o "
    " JOIN e ca ON ca.conv_id = ab.conv_id AND ca.s = bc.o "
    "  AND ca.o = ab.s "
    " WHERE bc.o <> ab.s AND ab.s < ab.o AND ab.s < bc.o) "
    "SELECT 'two_path' AS motif, c AS n FROM tp "
    "UNION ALL SELECT 'transitive', c FROM tr "
    "UNION ALL SELECT 'cycle', c FROM cy",
)
def kg_motif_census(spark, sf):
    """Directed triad census of the extracted graph — the three
    building-block motifs network analysis counts first (Milo et al.'s
    motif-census method): open two-paths a->b->c, TRANSITIVE triangles
    (a->b, b->c, a->c — the feed-forward motif whose excess over chance
    is the signature of hierarchical/causal structure), and directed
    3-cycles (feedback loops — in a KG built from Q->A turn order these
    should be rare, so a spike flags extraction noise). The undirected
    complement of ``kg_triangles``/``kg_clustering``, which cannot
    separate feed-forward from feedback.

    Count contracts: edges are the DISTINCT conv-scoped DIRECTED pairs
    with predicates collapsed and self-loops dropped; two-paths and
    transitive triangles are counted per ordered instance (each role
    assignment is distinct by construction); each directed 3-cycle is
    counted ONCE via its min-node rotation anchor (of the three
    rotations only the one starting at the lexicographically smallest
    node survives a < comparisons over ASCII entity names — identical
    collation both engines). All counts exact BIGINTs — no floats
    anywhere.

    Scale shape: the kg_two_hop discipline — every join is bounded by
    convs x entity-domain^2 on the pre-aggregated distinct edge set,
    never by raw triples, and every shuffle keys conv_id-first so the
    materialized triple table's conversation co-partitioning is
    reused; the census rows are three 1-row aggregates."""
    t = _triples_table(spark, sf)
    e = (
        t.filter(F.col("subj") != F.col("obj"))
        .select("conv_id", F.col("subj").alias("s"), F.col("obj").alias("o"))
        .distinct()
        .localCheckpoint()
    )
    ab = e.select("conv_id", F.col("s").alias("a"), F.col("o").alias("b"))
    bc = e.select("conv_id", F.col("s").alias("b"), F.col("o").alias("c"))
    two = ab.join(bc, ["conv_id", "b"]).filter(F.col("c") != F.col("a"))
    tp = two.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
        F.lit("two_path").alias("motif"), "n"
    )
    ac = e.select(
        "conv_id", F.col("s").alias("a"), F.col("o").alias("c")
    )
    tr = (
        two.join(ac, ["conv_id", "a", "c"])
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit("transitive").alias("motif"), "n")
    )
    ca = e.select(
        "conv_id", F.col("s").alias("c"), F.col("o").alias("a")
    )
    cy = (
        two.filter((F.col("a") < F.col("b")) & (F.col("a") < F.col("c")))
        .join(ca, ["conv_id", "c", "a"])
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit("cycle").alias("motif"), "n")
    )
    return tp.unionByName(tr).unionByName(cy)


# --------------------------------------------- resource-allocation index --

@register(
    "kg_resource_allocation",
    # Resource-allocation link-prediction index (Zhou/Lü/Zhang 2009):
    # for every same-conv entity pair sharing >= 1 neighbour,
    # RA = sum over common neighbours z of 1/deg(z), folded in a FIXED
    # order (degrees sorted ascending, left-associated, init 0) so the
    # float sum is bit-identical on both engines — equal degrees
    # contribute identical terms, so tie order cannot matter.
    f"WITH t AS ({_TRIPLES_SQL}), e AS ({_EDGES_SYM_SQL}), "
    "deg AS (SELECT conv_id, s AS node, CAST(COUNT(*) AS BIGINT) AS d "
    " FROM e GROUP BY conv_id, s), "
    "cm AS (SELECT a.conv_id, a.s AS ea, b.s AS eb, "
    " CAST(COUNT(*) AS BIGINT) AS c, list_sort(list(dz.d)) AS ds "
    " FROM e a "
    " JOIN e b ON b.conv_id = a.conv_id AND b.o = a.o AND a.s < b.s "
    " JOIN deg dz ON dz.conv_id = a.conv_id AND dz.node = a.o "
    " GROUP BY a.conv_id, a.s, b.s) "
    "SELECT conv_id, ea AS ent_a, eb AS ent_b, c AS n_common, "
    "printf('%.6f', ROUND(list_reduce("
    " list_prepend(CAST(0 AS DOUBLE), ds), "
    " (s, x) -> s + CAST(1 AS DOUBLE) / CAST(x AS DOUBLE)), 6)) AS ra "
    "FROM cm",
)
def kg_resource_allocation(spark, sf):
    """Resource-allocation link prediction over the KG — for every
    same-conversation entity pair sharing at least one neighbour,
    RA(a, b) = sum over common neighbours z of 1/deg(z). The
    degree-weighted upgrade of ``kg_neighbor_jaccard``: a common
    neighbour that connects to everything carries almost no evidence,
    one that connects to little carries a lot — on real graphs RA is
    the strongest of the classic local predictors (Zhou, Lü & Zhang,
    Eur. Phys. J. B 2009; it outperforms Adamic-Adar's log damping
    while needing no log at all — which also keeps libm out of the
    contract).

    Float discipline: the reciprocal-degree sum is order-sensitive, so
    both engines fold it in the SAME fixed order — common-neighbour
    degrees sorted ascending, left-associated, init exact 0.0 (Spark:
    ``aggregate(sort_array(...))``; oracle: ``list_reduce`` over the
    0-prepended sorted list — probed equivalent): each step is one
    exact cast + one IEEE division + one add, bit-identical. Equal
    degrees produce identical terms, so tie order is immaterial by
    construction.

    Scale shape: the kg_neighbor_jaccard discipline — the shared
    neighbour's degree joins onto the edge set BEFORE pairing (one
    (conv_id, node)-keyed broadcast-sized join), pairs generate via the
    (conv_id, shared-neighbour) self-join bounded by convs x
    entity-domain^2, and the fold runs over each pair's collected
    degree list (bounded by the entity domain), all conv_id-first."""
    e = _sym_edges(_triples_table(spark, sf))
    deg = e.groupBy("conv_id", F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    ez = e.select("conv_id", F.col("s").alias("ea"), "o").join(
        deg.select(
            "conv_id", F.col("node").alias("o"), F.col("d").alias("dz")
        ),
        ["conv_id", "o"],
    )
    pairs = (
        ez.join(
            e.select("conv_id", F.col("s").alias("eb"), "o"),
            ["conv_id", "o"],
        )
        .filter(F.col("ea") < F.col("eb"))
        .groupBy("conv_id", "ea", "eb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sort_array(F.collect_list("dz")).alias("ds"),
        )
    )
    ra = F.expr(
        "aggregate(ds, CAST(0 AS DOUBLE), "
        "(s, x) -> s + CAST(1 AS DOUBLE) / CAST(x AS DOUBLE))"
    )
    return pairs.select(
        "conv_id",
        F.col("ea").alias("ent_a"),
        F.col("eb").alias("ent_b"),
        F.col("c").alias("n_common"),
        F.format_string("%.6f", F.round(ra, 6)).alias("ra"),
    )


# ------------------------------------------------ personalized PageRank ----

@register("kg_ppr", None)  # pytest == kg_ppr_py twin EXACTLY (sorted folds)
def kg_ppr(spark, sf, iters: int = 10, damping: float = 0.85):
    """Personalized PageRank from a deterministic seed entity — the
    'related entities' ranking a KG serves per-query (global PageRank
    answers 'important overall'; PPR answers 'important RELATIVE TO
    this entity', the primitive behind entity recommendation and
    query expansion). Teleport mass returns to the single seed — the
    most-frequent subject entity, ties broken lexicographically, so
    the seed is a pure function of the graph.

    Same iterative discipline as ``kg_pagerank``: distinct-edge join +
    groupBy per iteration over the bounded entity domain, fixed
    ``iters`` (zero in-loop driver barriers), ``localCheckpoint`` per
    round, dangling mass dropped (documented simplification, matching
    kg_pagerank). Determinism: per-node in-rank reduction is a SORTED
    left fold, and the python twin folds in the same order, so the two
    agree bit-for-bit (the kg_hits exactness contract, not the
    pagerank twin's atol)."""
    t = _triples_table(spark, sf)
    edges = t.select("subj", "obj").distinct()
    seed_row = (
        t.groupBy("subj")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("subj"))
        .limit(1)
        .collect()
    )
    if not seed_row:
        return spark.createDataFrame([], "node string, rank double")
    seed = seed_row[0]["subj"]
    nodes = (
        edges.select(F.col("subj").alias("node"))
        .unionByName(edges.select(F.col("obj").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    outdeg = edges.groupBy("subj").agg(F.count(F.lit(1)).alias("deg"))
    edges = edges.join(outdeg, "subj").localCheckpoint()
    rank = nodes.withColumn(
        "rank",
        F.when(F.col("node") == seed, F.lit(1.0)).otherwise(F.lit(0.0)),
    )
    for _ in range(iters):
        contrib = edges.join(
            rank.withColumnRenamed("node", "subj"), "subj"
        ).select(
            F.col("obj").alias("node"),
            (F.col("rank") / F.col("deg")).alias("c"),
        )
        agg = contrib.groupBy("node").agg(
            F.aggregate(
                F.array_sort(F.collect_list("c")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("in_rank")
        )
        rank = (
            nodes.join(agg, "node", "left")
            .select(
                "node",
                (
                    F.when(
                        F.col("node") == seed, F.lit(1.0 - damping)
                    ).otherwise(F.lit(0.0))
                    + F.lit(damping) * F.coalesce("in_rank", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return rank.select(
        F.lit(seed).alias("seed"), "node", F.round("rank", 6).alias("rank")
    )


def kg_ppr_py(
    edges: pd.DataFrame, seed: str, iters: int = 10, damping: float = 0.85
) -> pd.DataFrame:
    """Single-process twin of ``kg_ppr`` replaying the IDENTICAL
    sorted-left-fold accumulation, so the comparison is exact."""
    e = edges.drop_duplicates()
    nodes = sorted(set(e["subj"]) | set(e["obj"]))
    if not nodes:
        return pd.DataFrame({"node": [], "rank": []})
    deg = e.groupby("subj").size().to_dict()
    out_edges: dict = {}
    for s, o in zip(e["subj"], e["obj"]):
        out_edges.setdefault(s, []).append(o)
    rank = {v: (1.0 if v == seed else 0.0) for v in nodes}
    for _ in range(iters):
        contribs: dict = {v: [] for v in nodes}
        for s, outs in out_edges.items():
            c = rank[s] / float(deg[s])
            for o in outs:
                contribs[o].append(c)
        nxt = {}
        for v in nodes:
            acc = 0.0
            for c in sorted(contribs[v]):
                acc = acc + c
            base = (1.0 - damping) if v == seed else 0.0
            nxt[v] = base + damping * acc
        rank = nxt
    return pd.DataFrame(
        {"node": nodes, "rank": [rank[v] for v in nodes]}
    )


# ------------------------------------------------ global transitivity ----

@register(
    "kg_transitivity",
    # Global transitivity (Newman's clustering): 3 x triangles over
    # connected triples, computed as 6*T / sum(deg*(deg-1)) over the
    # symmetrized distinct edge set — exact integers, ONE division.
    f"WITH t AS ({_TRIPLES_SQL}), e AS ({_EDGES_SYM_SQL}), "
    "deg AS (SELECT conv_id, s AS node, CAST(COUNT(*) AS BIGINT) AS d "
    " FROM e GROUP BY conv_id, s), "
    "tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS t3 FROM e e1 "
    " JOIN e e2 ON e2.conv_id = e1.conv_id AND e2.s = e1.s "
    "  AND e2.o > e1.o "
    " JOIN e e3 ON e3.conv_id = e1.conv_id AND e3.s = e1.o "
    "  AND e3.o = e2.o "
    " WHERE e1.s < e1.o), "
    "p AS (SELECT CAST(SUM(d * (d - 1)) AS BIGINT) AS paths2 FROM deg) "
    "SELECT tri.t3 AS n_triangles, p.paths2 AS n_two_paths_doubled, "
    "printf('%.6f', ROUND(CAST(6 * tri.t3 AS DOUBLE) "
    " / CAST(p.paths2 AS DOUBLE), 6)) AS transitivity "
    "FROM tri, p WHERE p.paths2 > 0",
)
def kg_transitivity(spark, sf):
    """Global transitivity (Newman's global clustering coefficient) —
    3 x triangles / connected triples over the whole extracted graph:
    the ONE-NUMBER closure readout next to ``kg_clustering``'s
    per-node coefficients (the two famously disagree on skewed graphs
    — the global ratio weights hubs by their triple count, the
    per-node mean doesn't — so a KG consumer wants both).

    Count contracts: triangles count once per unordered {x<y<z} via
    the oriented kg_triangles join over the symmetrized distinct edge
    set; connected triples (open two-paths) = sum over nodes of
    deg*(deg-1)/2, kept DOUBLED so everything stays integer — the
    ratio 3T/P becomes exactly 6T/paths2. ONE correctly-rounded IEEE
    division under ROUND + %.6f.

    Scale shape: the kg_triangles discipline — one oriented edge
    self-join bounded by convs x entity-domain^2, one degree rollup,
    two 1-row aggregates."""
    e = _sym_edges(_triples_table(spark, sf))
    deg = e.groupBy("conv_id", F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    e1 = e.filter(F.col("s") < F.col("o")).select(
        "conv_id", F.col("s").alias("x"), F.col("o").alias("y")
    )
    e2 = e.select(
        "conv_id", F.col("s").alias("x"), F.col("o").alias("z")
    )
    e3 = e.select(
        "conv_id", F.col("s").alias("y"), F.col("o").alias("z")
    )
    tri = (
        e1.join(e2, ["conv_id", "x"])
        .filter(F.col("z") > F.col("y"))
        .join(e3, ["conv_id", "y", "z"])
        .agg(F.count(F.lit(1)).cast("long").alias("t3"))
    )
    p = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1)).cast("long").alias("paths2")
    )
    return (
        tri.crossJoin(F.broadcast(p))
        .filter(F.col("paths2") > 0)
        .select(
            F.col("t3").alias("n_triangles"),
            F.col("paths2").alias("n_two_paths_doubled"),
            F.format_string(
                "%.6f",
                F.round(
                    (6 * F.col("t3")).cast("double")
                    / F.col("paths2").cast("double"),
                    6,
                ),
            ).alias("transitivity"),
        )
    )


# ------------------------------------------------ rich-club coefficient ----

@register(
    "kg_rich_club",
    # Rich-club coefficient at degree thresholds k = 1..4: among nodes
    # with conv-scoped degree > k, the realized fraction of possible
    # undirected links — phi(k) = 2E_k / (N_k (N_k - 1)) pooled across
    # conversations, kept integer until ONE division (edge count is the
    # symmetrized directed count, so the 2x cancels: phi = E_sym/(N(N-1))
    # per conv summed — both sides exact).
    f"WITH t AS ({_TRIPLES_SQL}), e AS ({_EDGES_SYM_SQL}), "
    "deg AS (SELECT conv_id, s AS node, CAST(COUNT(*) AS BIGINT) AS d "
    " FROM e GROUP BY conv_id, s), "
    "ks AS (SELECT unnest(generate_series(1, 4)) AS k), "
    "rich AS (SELECT k, conv_id, node FROM deg, ks WHERE d > k), "
    "nn AS (SELECT k, CAST(SUM(cnt * (cnt - 1)) AS BIGINT) AS pairs2, "
    " CAST(SUM(cnt) AS BIGINT) AS n_nodes FROM "
    " (SELECT k, conv_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM rich "
    "  GROUP BY k, conv_id) g GROUP BY k), "
    "ee AS (SELECT r1.k, CAST(COUNT(*) AS BIGINT) AS edges2 FROM e "
    " JOIN rich r1 ON r1.conv_id = e.conv_id AND r1.node = e.s "
    " JOIN rich r2 ON r2.conv_id = e.conv_id AND r2.node = e.o "
    "  AND r2.k = r1.k "
    " GROUP BY r1.k) "
    "SELECT CAST(nn.k AS BIGINT) AS k, nn.n_nodes, "
    "COALESCE(ee.edges2, 0) // 2 AS n_edges, "
    "printf('%.6f', ROUND(CAST(COALESCE(ee.edges2, 0) AS DOUBLE) "
    " / CAST(nn.pairs2 AS DOUBLE), 6)) AS phi "
    "FROM nn LEFT JOIN ee ON ee.k = nn.k WHERE nn.pairs2 > 0",
)
def kg_rich_club(spark, sf):
    """Rich-club coefficient phi(k) for degree thresholds 1..4 — do the
    well-connected entities preferentially link to EACH OTHER? The
    hub-interconnection readout next to ``kg_assortativity`` (the
    mixing coefficient is one number; the rich-club curve localizes
    WHERE hub clustering lives — the Colizza et al. 2006 analysis,
    computed exactly and pooled per conversation).

    Count contracts: degree and membership are conv-scoped over the
    symmetrized distinct edge set; possible pairs are pooled per conv
    as sum cnt*(cnt-1) DOUBLED, and realized links count symmetrized
    directed rows (also the doubled undirected count), so the 2x
    cancels and phi is ONE division of exact BIGINTs under
    ROUND + %.6f; the reported n_edges halves the symmetric count
    exactly.

    Scale shape: the kg_triangles discipline — one degree rollup, one
    4-row threshold dimension crossed with the bounded membership
    table, one edge join keyed conv_id-first; everything after the
    distinct edge set is dimension-sized."""
    e = _sym_edges(_triples_table(spark, sf))
    deg = e.groupBy("conv_id", F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    ks = spark.range(1, 5).select(F.col("id").cast("long").alias("k"))
    rich = (
        deg.crossJoin(F.broadcast(ks))
        .filter(F.col("d") > F.col("k"))
        .select("k", "conv_id", "node")
        .localCheckpoint()
    )
    nn = (
        rich.groupBy("k", "conv_id")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .groupBy("k")
        .agg(
            F.sum(F.col("cnt") * (F.col("cnt") - 1))
            .cast("long")
            .alias("pairs2"),
            F.sum("cnt").cast("long").alias("n_nodes"),
        )
    )
    r1 = rich.select("k", "conv_id", F.col("node").alias("s"))
    r2 = rich.select("k", "conv_id", F.col("node").alias("o"))
    ee = (
        e.join(r1, ["conv_id", "s"])
        .join(r2, ["k", "conv_id", "o"])
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("edges2"))
    )
    return (
        nn.join(ee, "k", "left")
        .filter(F.col("pairs2") > 0)
        .select(
            "k",
            "n_nodes",
            F.expr("coalesce(edges2, 0) div 2").alias("n_edges"),
            F.format_string(
                "%.6f",
                F.round(
                    F.coalesce(F.col("edges2"), F.lit(0)).cast("double")
                    / F.col("pairs2").cast("double"),
                    6,
                ),
            ).alias("phi"),
        )
    )


# ------------------------------------------- degree centralization ----

@register(
    "kg_degree_centralization",
    # Freeman degree centralization per conversation: sum(dmax - d_i)
    # over the star-graph maximum (n-1)(n-2) — exact integers, ONE
    # division per conversation.
    f"WITH t AS ({_TRIPLES_SQL}), e AS ({_EDGES_SYM_SQL}), "
    "deg AS (SELECT conv_id, s AS node, CAST(COUNT(*) AS BIGINT) AS d "
    " FROM e GROUP BY conv_id, s), "
    "m AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n, "
    " CAST(MAX(d) AS BIGINT) AS dmax, CAST(SUM(d) AS BIGINT) AS sd "
    " FROM deg GROUP BY conv_id) "
    "SELECT conv_id, n AS n_nodes, dmax, "
    "printf('%.6f', ROUND(CAST(n * dmax - sd AS DOUBLE) "
    " / CAST((n - 1) * (n - 2) AS DOUBLE), 6)) AS centralization "
    "FROM m WHERE n > 2",
)
def kg_degree_centralization(spark, sf):
    """Freeman degree centralization per conversation — how
    star-shaped is each conversation's entity graph? (1.0 = a perfect
    hub-and-spoke around one entity; 0 = perfectly even degrees.) The
    per-conversation topology fingerprint next to ``kg_assortativity``
    (global mixing) and ``macro_graph_health`` — in a Q->A transcript
    KG a high value means the conversation orbits one entity, which is
    exactly what a dialogue summarizer wants to know first.

    Float discipline: sum(dmax - d_i) collapses to n*dmax - sum(d) —
    exact BIGINTs — and the star-graph maximum (n-1)(n-2) is exact, so
    centralization is ONE correctly-rounded IEEE division under
    ROUND + %.6f; degenerate n <= 2 conversations are filtered by the
    integer guard on both engines.

    Scale shape: one degree rollup over the symmetrized distinct edge
    set, one conv-keyed three-integer aggregate — both reuse the
    materialized triple table's conversation co-partitioning."""
    e = _sym_edges(_triples_table(spark, sf))
    deg = e.groupBy("conv_id", F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    m = deg.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("d").cast("long").alias("dmax"),
        F.sum("d").cast("long").alias("sd"),
    )
    n = F.col("n")
    return m.filter(n > 2).select(
        "conv_id",
        n.alias("n_nodes"),
        "dmax",
        F.format_string(
            "%.6f",
            F.round(
                (n * F.col("dmax") - F.col("sd")).cast("double")
                / ((n - 1) * (n - 2)).cast("double"),
                6,
            ),
        ).alias("centralization"),
    )


# ------------------------------------------- predicate co-occurrence ----

@register(
    "kg_pred_cooccur",
    # Predicate co-occurrence: for each predicate pair, the Jaccard of
    # their conversation sets — exact integer set sizes via two keyed
    # distinct aggregations and ONE division per pair.
    f"WITH t AS ({_TRIPLES_SQL}), "
    "pc AS (SELECT DISTINCT pred, conv_id FROM t), "
    "n AS (SELECT pred, CAST(COUNT(*) AS BIGINT) AS n FROM pc GROUP BY 1), "
    "b AS (SELECT a.pred AS pred_a, c.pred AS pred_b, "
    " CAST(COUNT(*) AS BIGINT) AS inter FROM pc a "
    " JOIN pc c ON c.conv_id = a.conv_id AND a.pred < c.pred "
    " GROUP BY 1, 2) "
    "SELECT pred_a, pred_b, inter, na.n AS n_a, nb.n AS n_b, "
    "printf('%.6f', ROUND(CAST(inter AS DOUBLE) "
    " / (na.n + nb.n - inter), 6)) AS jaccard "
    "FROM b JOIN n na ON na.pred = b.pred_a "
    "JOIN n nb ON nb.pred = b.pred_b",
)
def kg_pred_cooccur(spark, sf):
    """Predicate co-occurrence — for every predicate pair, the Jaccard
    similarity of the conversation sets they appear in: the
    SCHEMA-level companion of ``kg_cooccur_lift`` (that key asks which
    ENTITIES co-occur; this asks which RELATION TYPES travel together —
    the signal an ontology designer uses to merge or split predicates,
    and a drift monitor tracks release-over-release).

    Float discipline: set sizes and intersections are exact BIGINTs
    from distinct-grain aggregations; each Jaccard is ONE
    correctly-rounded IEEE division under ROUND + %.6f.

    Scale shape: everything is bounded by predicates x conversations —
    one distinct collapse of the triple table, one conv-keyed
    self-join over the predicate-domain-sized table, one broadcast of
    the per-predicate counts."""
    t = _triples_table(spark, sf)
    pc = t.select("pred", "conv_id").distinct().localCheckpoint()
    n = pc.groupBy("pred").agg(F.count(F.lit(1)).cast("long").alias("n"))
    b = (
        pc.select(F.col("pred").alias("pred_a"), "conv_id")
        .join(
            pc.select(F.col("pred").alias("pred_b"), "conv_id"),
            "conv_id",
        )
        .filter(F.col("pred_a") < F.col("pred_b"))
        .groupBy("pred_a", "pred_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    na = n.select(F.col("pred").alias("pred_a"), F.col("n").alias("n_a"))
    nb = n.select(F.col("pred").alias("pred_b"), F.col("n").alias("n_b"))
    return (
        b.join(F.broadcast(na), "pred_a")
        .join(F.broadcast(nb), "pred_b")
        .select(
            "pred_a",
            "pred_b",
            "inter",
            "n_a",
            "n_b",
            F.format_string(
                "%.6f",
                F.round(
                    F.col("inter").cast("double")
                    / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                    6,
                ),
            ).alias("jaccard"),
        )
    )


# ------------------------------------------------------ K4 census ----

@register(
    "kg_four_cliques",
    f"WITH t AS ({_TRIPLES_SQL}), e AS ({_EDGES_ORIENTED_SQL}), "
    f"tn AS ({_TRIANGLE_NODES_SQL}) "
    "SELECT tn.conv_id, CAST(COUNT(*) AS BIGINT) AS n_k4 FROM tn "
    "JOIN e e4 ON e4.conv_id = tn.conv_id AND e4.a = tn.x AND e4.b > tn.z "
    "JOIN e e5 ON e5.conv_id = tn.conv_id AND e5.a = tn.y AND e5.b = e4.b "
    "JOIN e e6 ON e6.conv_id = tn.conv_id AND e6.a = tn.z AND e6.b = e4.b "
    "GROUP BY tn.conv_id",
)
def kg_four_cliques(spark, sf):
    """Per-conversation K4 (4-clique) count over the undirected entity
    graph — the next clique statistic after ``kg_triangles`` (dense
    4-node cores signal tightly coupled entity groups the triangle
    count alone cannot see; the clique ladder is how graph-density
    profiles distinguish one hub-with-spokes from an actual community).
    Each K4 x<y<z<w is counted exactly once: the canonical triangle
    (x, y, z) from the SHARED node-level census extended by the fourth
    node w > z through its three remaining edges (x,w), (y,w), (z,w).

    All counts are exact integers — no float contract at all.

    Scale shape: the same pre-aggregation discipline as kg_triangles —
    the join input is the DISTINCT oriented edge set, bounded per
    conversation by |dict|²; all six self-join shuffles key
    conv_id-first (co-partitioned with the triple table's bucketing),
    and the equality residuals fold into the join keys. Nothing ever
    crosses conversations, so the worst case is convs × domain⁴ with a
    dictionary-bounded domain — never fact-scale."""
    e = _oriented_edges(_triples_table(spark, sf))
    tn = _conv_triangle_nodes(e)
    e4 = e.select("conv_id", F.col("a").alias("a4"), F.col("b").alias("w4"))
    e5 = e.select("conv_id", F.col("a").alias("a5"), F.col("b").alias("w5"))
    e6 = e.select("conv_id", F.col("a").alias("a6"), F.col("b").alias("w6"))
    return (
        tn.join(e4, ["conv_id"])
        .filter((F.col("a4") == F.col("x")) & (F.col("w4") > F.col("z")))
        .join(e5, ["conv_id"])
        .filter((F.col("a5") == F.col("y")) & (F.col("w5") == F.col("w4")))
        .join(e6, ["conv_id"])
        .filter((F.col("a6") == F.col("z")) & (F.col("w6") == F.col("w4")))
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_k4"))
    )


# ------------------------------------- preferential attachment ----

@register(
    "kg_preferential_attachment",
    f"WITH t AS ({_TRIPLES_SQL}), e AS ({_EDGES_ORIENTED_SQL}), "
    "d AS (SELECT conv_id, ent, CAST(COUNT(*) AS BIGINT) AS deg FROM "
    " (SELECT conv_id, a AS ent FROM e UNION ALL "
    "  SELECT conv_id, b FROM e) u GROUP BY 1, 2), "
    "p AS (SELECT x.conv_id, x.ent AS a, y.ent AS b, "
    "  x.deg AS deg_a, y.deg AS deg_b "
    " FROM d x JOIN d y ON x.conv_id = y.conv_id AND x.ent < y.ent "
    " WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.conv_id = x.conv_id "
    "  AND e.a = x.ent AND e.b = y.ent)) "
    "SELECT conv_id, a, b, deg_a, deg_b, deg_a * deg_b AS pa_score "
    "FROM p ORDER BY pa_score DESC, conv_id, a, b LIMIT 100",
)
def kg_preferential_attachment(spark, sf):
    """Preferential-attachment link prediction: for same-conversation
    entity pairs NOT yet connected, the classic PA score deg(a)·deg(b)
    — the degree-product baseline every link-prediction benchmark
    reports next to common-neighbour scores (``kg_neighbor_jaccard``
    needs a shared neighbour to fire; PA ranks the well-connected
    still-unlinked pairs those keys are blind to — 'these two hubs will
    meet'). Top-100 under the tie-free total order
    (pa_score DESC, conv_id, a, b).

    All degrees and scores are exact integers — no float contract.

    Scale shape: degrees come from the DISTINCT oriented edge set (one
    conv_id-keyed aggregation); the candidate self-join and the
    anti-join against existing edges are bounded per conversation by
    the dictionary-bounded entity domain and key conv_id-first; the
    global top-100 is TakeOrderedAndProject — no global sort ever
    materializes."""
    e = _oriented_edges(_triples_table(spark, sf)).localCheckpoint()
    d = (
        e.select("conv_id", F.col("a").alias("ent"))
        .unionByName(e.select("conv_id", F.col("b").alias("ent")))
        .groupBy("conv_id", "ent")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    x = d.select(
        "conv_id", F.col("ent").alias("a"), F.col("deg").alias("deg_a")
    )
    y = d.select(
        "conv_id", F.col("ent").alias("b"), F.col("deg").alias("deg_b")
    )
    pairs = x.join(y, ["conv_id"]).filter(F.col("a") < F.col("b"))
    np_ = pairs.join(e, ["conv_id", "a", "b"], "left_anti")
    return (
        np_.select(
            "conv_id",
            "a",
            "b",
            "deg_a",
            "deg_b",
            (F.col("deg_a") * F.col("deg_b")).alias("pa_score"),
        )
        .orderBy(F.desc("pa_score"), "conv_id", "a", "b")
        .limit(100)
    )


@register(
    "kg_salton_sorensen",
    # Salton (cosine) and Sorensen-Dice link-prediction indices over
    # the SAME common-neighbour pair table as kg_neighbor_jaccard:
    # counts are exact integers, salton = c / sqrt(da*db) is one exact
    # integer product, one correctly-rounded sqrt and one division;
    # sorensen = 2c / (da + db) is one division — each a fixed chain
    # spelled identically on both engines under ROUND + %.6f.
    f"WITH t AS ({_TRIPLES_SQL}), e AS ({_EDGES_SYM_SQL}), "
    "deg AS (SELECT conv_id, s AS node, COUNT(*) AS d FROM e "
    " GROUP BY conv_id, s), "
    "cm AS (SELECT a.conv_id, a.s AS ea, b.s AS eb, COUNT(*) AS c FROM e a "
    " JOIN e b ON b.conv_id = a.conv_id AND b.o = a.o AND a.s < b.s "
    " GROUP BY a.conv_id, a.s, b.s) "
    "SELECT cm.conv_id, cm.ea AS ent_a, cm.eb AS ent_b, "
    "CAST(c AS BIGINT) AS n_common, "
    "printf('%.6f', ROUND(CAST(c AS DOUBLE) "
    " / SQRT(CAST(da.d * db.d AS DOUBLE)), 6)) AS salton, "
    "printf('%.6f', ROUND(CAST(2 * c AS DOUBLE) "
    " / CAST(da.d + db.d AS DOUBLE), 6)) AS sorensen "
    "FROM cm JOIN deg da ON da.conv_id = cm.conv_id AND da.node = cm.ea "
    "JOIN deg db ON db.conv_id = cm.conv_id AND db.node = cm.eb",
)
def kg_salton_sorensen(spark, sf):
    """Salton (cosine) and Sorensen-Dice link-prediction indices for
    every same-conversation entity pair sharing a neighbour — the two
    degree-normalized companions of ``kg_neighbor_jaccard`` (Jaccard
    punishes union size, Salton normalizes by the geometric mean of
    the degrees, Sorensen by the arithmetic mean; a KG consumer ranks
    candidate edges under all three because they disagree exactly on
    hub-attached pairs) and of ``kg_preferential_attachment`` (which
    ignores the common neighbourhood entirely).

    Float discipline: common-neighbour and degree counts are exact
    integers off the shared pair table; salton is one exact integer
    product, one correctly-rounded sqrt and ONE IEEE division;
    sorensen is one doubling and ONE division — both spelled
    identically on the two engines under ROUND + %.6f.

    Scale shape: identical to kg_neighbor_jaccard — pairs come from
    the distinct symmetrized edge set self-joined on (conv_id,
    shared-neighbour), bounded by convs x entity-domain^2; degrees
    join back on (conv_id, node); every shuffle keys conv_id-first on
    the materialized triple table's co-partitioning."""
    e = _sym_edges(_triples_table(spark, sf))
    deg = e.groupBy("conv_id", F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    b_side = e.select("conv_id", F.col("s").alias("eb"), "o")
    cm = (
        e.select("conv_id", F.col("s").alias("ea"), "o")
        .join(b_side, ["conv_id", "o"])
        .filter(F.col("ea") < F.col("eb"))
        .groupBy("conv_id", "ea", "eb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    da = deg.select(
        "conv_id", F.col("node").alias("ea"), F.col("d").alias("da_d")
    )
    db = deg.select(
        "conv_id", F.col("node").alias("eb"), F.col("d").alias("db_d")
    )
    c = F.col("c")
    fmt = lambda x: F.format_string("%.6f", F.round(x, 6))  # noqa: E731
    return (
        cm.join(da, ["conv_id", "ea"])
        .join(db, ["conv_id", "eb"])
        .select(
            "conv_id",
            F.col("ea").alias("ent_a"),
            F.col("eb").alias("ent_b"),
            c.cast("long").alias("n_common"),
            fmt(
                c.cast("double")
                / F.sqrt((F.col("da_d") * F.col("db_d")).cast("double"))
            ).alias("salton"),
            fmt(
                (2 * c).cast("double")
                / (F.col("da_d") + F.col("db_d")).cast("double")
            ).alias("sorensen"),
        )
    )


def _hop_count_cases_sql() -> str:
    return ", ".join(
        f"CAST(SUM(CASE WHEN d = {h} THEN 1 ELSE 0 END) AS BIGINT) AS c{h}"
        for h in range(1, _REACH_MAX_HOPS + 1)
    )


def _hop_reciprocal_chain_sql() -> str:
    # Fixed left-associated chain c1/1 + c2/2 + ... — each term is one
    # correctly-rounded division of an exact integer by a small integer
    # literal, and the addition order is pinned by the expression text,
    # so the double is bit-identical across engines.
    return " + ".join(
        f"CAST(c{h} AS DOUBLE) / CAST({h} AS DOUBLE)"
        for h in range(1, _REACH_MAX_HOPS + 1)
    )


@register(
    "kg_harmonic",
    # Harmonic centrality off the shared all-pairs BFS: distances are
    # small integers <= _REACH_MAX_HOPS, so sum(1/d) collapses to a
    # FIXED 7-term chain over per-distance counts — no unordered float
    # sum ever runs (the bounded-domain alternative to sorted folds).
    _ALLPAIRS_SQL
    + f"SELECT conv_id, src AS entity, n_reach, "
    f"printf('%.6f', ROUND({_hop_reciprocal_chain_sql()}, 6)) AS harmonic "
    f"FROM (SELECT conv_id, src, "
    f" CAST(SUM(CASE WHEN src <> node THEN 1 ELSE 0 END) AS BIGINT) "
    f"  AS n_reach, {_hop_count_cases_sql()} "
    f" FROM sp GROUP BY conv_id, src) g WHERE n_reach > 0",
)
def kg_harmonic(spark, sf):
    """Per-entity harmonic centrality over the strong-edge backbone —
    the disconnected-graph-safe variant of ``kg_closeness`` (closeness
    averages distances and collapses on unreachable nodes; harmonic
    sums reciprocal distances, giving unreachable pairs exactly zero
    weight, which is why it is the centrality of record for KGs whose
    conversations fragment into components).

    Float discipline: hop distances are bounded by ``_REACH_MAX_HOPS``,
    so sum(1/d) collapses to a FIXED 7-term left-associated chain over
    exact per-distance counts — c1/1 + c2/2 + ... — each term one
    correctly-rounded division by a small literal, the addition order
    pinned by the shared expression text; no unordered float SUM and
    no sorted fold is needed (the bounded-domain trick next to
    kg_resource_allocation's sorted-fold discipline). Reported under
    ROUND + %.6f.

    Scale shape: reuses the memoized ``_strong_allpairs_dist`` table —
    one (conv_id, src) rollup, zero extra joins."""
    dist = _strong_allpairs_dist(spark, sf)
    aggs = [
        F.sum(
            F.when(F.col("src") != F.col("node"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_reach")
    ] + [
        F.sum(F.when(F.col("d") == h, 1).otherwise(0))
        .cast("long")
        .alias(f"c{h}")
        for h in range(1, _REACH_MAX_HOPS + 1)
    ]
    g = dist.groupBy("conv_id", "src").agg(*aggs)
    chain = None
    for h in range(1, _REACH_MAX_HOPS + 1):
        term = F.col(f"c{h}").cast("double") / F.lit(h).cast("double")
        chain = term if chain is None else chain + term
    return g.filter(F.col("n_reach") > 0).select(
        "conv_id",
        F.col("src").alias("entity"),
        "n_reach",
        F.format_string("%.6f", F.round(chain, 6)).alias("harmonic"),
    )


@register(
    "kg_efficiency",
    # Global efficiency per conversation: mean over ORDERED node pairs
    # of 1/d (0 for unreachable) — the same bounded-domain 7-term chain
    # as kg_harmonic at the conversation grain, then ONE further
    # division by the exact pair count n*(n-1).
    _ALLPAIRS_SQL
    + f"SELECT conv_id, n_nodes, n_reach_pairs, "
    f"printf('%.6f', ROUND(({_hop_reciprocal_chain_sql()})"
    f" / CAST(n_nodes * (n_nodes - 1) AS DOUBLE), 6)) AS efficiency "
    f"FROM (SELECT conv_id, "
    f" CAST(COUNT(DISTINCT src) AS BIGINT) AS n_nodes, "
    f" CAST(SUM(CASE WHEN src <> node THEN 1 ELSE 0 END) AS BIGINT) "
    f"  AS n_reach_pairs, {_hop_count_cases_sql()} "
    f" FROM sp GROUP BY conv_id) g WHERE n_nodes >= 2",
)
def kg_efficiency(spark, sf):
    """Global efficiency per conversation graph — Latora & Marchiori's
    small-world readout: the mean over ordered node pairs of 1/d, with
    unreachable pairs contributing exactly zero (the conversation-level
    integral of ``kg_harmonic``; a conversation whose backbone is one
    tight clique scores near 1, a fragmented or chain-like one near 0).
    The health number a KG pipeline tracks per corpus drop next to
    ``kg_diameter``'s worst case.

    Float discipline: per-distance pair counts are exact integers off
    the shared all-pairs BFS; sum(1/d) is the fixed 7-term chain of
    single divisions (addition order pinned by the shared text), and
    efficiency adds ONE further division by the exact integer
    n*(n-1) — all under ROUND + %.6f.

    Scale shape: one conv_id rollup of the memoized
    ``_strong_allpairs_dist`` table; no joins, no windows."""
    dist = _strong_allpairs_dist(spark, sf)
    aggs = [
        F.countDistinct("src").cast("long").alias("n_nodes"),
        F.sum(F.when(F.col("src") != F.col("node"), 1).otherwise(0))
        .cast("long")
        .alias("n_reach_pairs"),
    ] + [
        F.sum(F.when(F.col("d") == h, 1).otherwise(0))
        .cast("long")
        .alias(f"c{h}")
        for h in range(1, _REACH_MAX_HOPS + 1)
    ]
    g = dist.groupBy("conv_id").agg(*aggs)
    chain = None
    for h in range(1, _REACH_MAX_HOPS + 1):
        term = F.col(f"c{h}").cast("double") / F.lit(h).cast("double")
        chain = term if chain is None else chain + term
    n = F.col("n_nodes")
    return g.filter(n >= 2).select(
        "conv_id",
        "n_nodes",
        "n_reach_pairs",
        F.format_string(
            "%.6f",
            F.round(chain / (n * (n - 1)).cast("double"), 6),
        ).alias("efficiency"),
    )


@register(
    "kg_condensation",
    # Condensation DAG of the directed strong backbone: contract each
    # SCC (the kg_scc CTE) to one node, keep the distinct cross-SCC
    # edges, and assign each component its LONGEST-PATH level — the
    # recursion seeds every component at depth 0 and steps along
    # cross-edges (the DAG is acyclic by construction, so the
    # level-(conv, comp, d) closure is finite and UNION terminates it).
    f"WITH RECURSIVE t AS ({_TRIPLES_SQL}), "
    "dp AS (SELECT conv_id, subj AS s, obj AS o, COUNT(*) AS n FROM t "
    " GROUP BY 1, 2, 3), "
    "dst AS (SELECT conv_id, SUM(n) AS tot, COUNT(*) AS ne FROM dp "
    " GROUP BY 1), "
    "de AS (SELECT dp.conv_id, s, o FROM dp JOIN dst USING (conv_id) "
    " WHERE dp.n * dst.ne > dst.tot), "
    "nodes AS (SELECT conv_id, s AS node FROM de "
    " UNION SELECT conv_id, o FROM de), "
    "r(conv_id, src, node) AS ("
    " SELECT conv_id, node, node FROM nodes "
    " UNION "
    " SELECT de.conv_id, r.src, de.o FROM r JOIN de "
    "  ON de.conv_id = r.conv_id AND de.s = r.node), "
    "scc AS (SELECT f.conv_id, f.src AS entity, MIN(f.node) AS lbl "
    " FROM r f JOIN r b ON b.conv_id = f.conv_id AND b.src = f.node "
    "  AND b.node = f.src GROUP BY 1, 2), "
    "ce AS (SELECT DISTINCT de.conv_id, sa.lbl AS ca, sb.lbl AS cb "
    " FROM de JOIN scc sa ON sa.conv_id = de.conv_id AND sa.entity = de.s "
    " JOIN scc sb ON sb.conv_id = de.conv_id AND sb.entity = de.o "
    " WHERE sa.lbl <> sb.lbl), "
    "comps AS (SELECT conv_id, lbl, CAST(COUNT(*) AS BIGINT) AS n_members "
    " FROM scc GROUP BY 1, 2), "
    "lv(conv_id, comp, d) AS ("
    " SELECT conv_id, lbl, 0 FROM comps "
    " UNION "
    " SELECT ce.conv_id, ce.cb, lv.d + 1 FROM lv JOIN ce "
    "  ON ce.conv_id = lv.conv_id AND ce.ca = lv.comp), "
    "lev AS (SELECT conv_id, comp, CAST(MAX(d) AS BIGINT) AS level "
    " FROM lv GROUP BY 1, 2) "
    "SELECT c.conv_id, c.lbl AS scc_label, c.n_members, lev.level, "
    "c.lbl NOT IN (SELECT cb FROM ce WHERE ce.conv_id = c.conv_id) "
    " AS is_source, "
    "c.lbl NOT IN (SELECT ca FROM ce WHERE ce.conv_id = c.conv_id) "
    " AS is_sink "
    "FROM comps c JOIN lev ON lev.conv_id = c.conv_id AND lev.comp = c.lbl",
)
def kg_condensation(spark, sf):
    """Condensation DAG of each conversation's directed strong
    backbone — contract every SCC (``kg_scc``'s partition) to one
    node and read off the acyclic skeleton: per component, its size,
    its LONGEST-PATH level (how deep into the reference flow it
    sits), and whether it is a source (nothing refers into it) or a
    sink (it refers to nothing outside itself). This is the
    information-flow summary a KG consumer reads after the cycle
    analysis: sources are where facts originate, sinks are where they
    accumulate, levels order everything in between — and on a DAG the
    longest-path level is well-defined, which is exactly what the
    contraction buys.

    Correctness is algorithm-vs-definition: the oracle extends the
    kg_scc reachability CTE with the distinct cross-component edges
    and a longest-path recursion seeded at every component (finite
    because the condensation is acyclic); this side runs Tarjan + a
    topological DP per conversation — the class-(b) grouped-map kernel
    (sequential per graph, distributed across conversations, ONE
    conv_id exchange). All-integer output — no float anywhere."""
    de = _strong_dir_edges_cached(spark, sf)

    def per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        conv = pdf["conv_id"].iloc[0]
        adj: dict = {}
        nodes = set()
        for s, o in zip(pdf["s"], pdf["o"]):
            nodes.add(s)
            nodes.add(o)
            adj.setdefault(s, []).append(o)
        for v in adj:
            adj[v].sort()
        index: dict = {}
        low: dict = {}
        on: set = set()
        stack: list = []
        comp: dict = {}
        counter = 0
        for root in sorted(nodes):
            if root in index:
                continue
            index[root] = low[root] = counter
            counter += 1
            stack.append(root)
            on.add(root)
            work = [(root, iter(adj.get(root, [])))]
            while work:
                v, it = work[-1]
                advanced = False
                for w in it:
                    if w not in index:
                        index[w] = low[w] = counter
                        counter += 1
                        stack.append(w)
                        on.add(w)
                        work.append((w, iter(adj.get(w, []))))
                        advanced = True
                        break
                    if w in on and index[w] < low[v]:
                        low[v] = index[w]
                if advanced:
                    continue
                work.pop()
                if work and low[v] < low[work[-1][0]]:
                    low[work[-1][0]] = low[v]
                if low[v] == index[v]:
                    scc = []
                    while True:
                        w = stack.pop()
                        on.discard(w)
                        scc.append(w)
                        if w == v:
                            break
                    lbl = min(scc)
                    for w in scc:
                        comp[w] = lbl
        from collections import Counter as _Counter

        sizes = _Counter(comp.values())
        # condensation edges + longest-path levels (topological DP over
        # the acyclic contraction; Kahn order by in-degree)
        cedges: set = set()
        for s, outs in adj.items():
            for o in outs:
                if comp[s] != comp[o]:
                    cedges.add((comp[s], comp[o]))
        csucc: dict = {}
        indeg: dict = {c: 0 for c in sizes}
        for a, b in sorted(cedges):
            csucc.setdefault(a, []).append(b)
            indeg[b] += 1
        level = {c: 0 for c in sizes}
        ready = sorted(c for c, d in indeg.items() if d == 0)
        order = []
        while ready:
            v = ready.pop(0)
            order.append(v)
            for w in csucc.get(v, []):
                if level[v] + 1 > level[w]:
                    level[w] = level[v] + 1
                indeg[w] -= 1
                if indeg[w] == 0:
                    ready.append(w)
            ready.sort()
        has_in = {b for _, b in cedges}
        has_out = {a for a, _ in cedges}
        comps = sorted(sizes)
        return pd.DataFrame(
            {
                "conv_id": [conv] * len(comps),
                "scc_label": comps,
                "n_members": [sizes[c] for c in comps],
                "level": [level[c] for c in comps],
                "is_source": [c not in has_in for c in comps],
                "is_sink": [c not in has_out for c in comps],
            }
        )

    return de.groupBy("conv_id").applyInPandas(
        per_conv,
        "conv_id string, scc_label string, n_members long, level long,"
        " is_source boolean, is_sink boolean",
    )


def _brandes_ebc(nodes: list, adj: dict) -> dict:
    """Exact EDGE betweenness (Brandes 2001, edge accumulation) over
    one undirected graph given as a symmetric adjacency dict of SORTED
    neighbour lists: in the dependency back-propagation, the shortest-
    path-DAG edge (v, w) receives exactly the contribution
    (sigma_v/sigma_w)(1 + delta_w) that flows to v. Sorted iteration
    fixes the float accumulation order (bit-stable). Returns unordered
    edge -> ebc (directed accumulation halved)."""
    from collections import deque

    ebc: dict = {}
    for s in nodes:
        stack = []
        pred = {v: [] for v in nodes}
        sigma = {v: 0 for v in nodes}
        dist = {v: -1 for v in nodes}
        sigma[s] = 1
        dist[s] = 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    pred[w].append(v)
        delta = {v: 0.0 for v in nodes}
        while stack:
            w = stack.pop()
            for v in pred[w]:
                c = (sigma[v] / sigma[w]) * (1.0 + delta[w])
                e = (v, w) if v < w else (w, v)
                ebc[e] = ebc.get(e, 0.0) + c
                delta[v] += c
    return {e: x / 2.0 for e, x in ebc.items()}


@register("kg_edge_betweenness", None)  # == pair-sum twin, pytest-pinned
def kg_edge_betweenness(spark, sf):
    """Exact edge betweenness per conversation — which RELATIONS carry
    the graph's traffic (the Girvan-Newman quantity: removing the
    highest-betweenness edges is the classic community-splitting move,
    and the edge ranking is what a KG curator reads to find the
    load-bearing facts that ``kg_betweenness``'s node scores only
    imply). Brandes' edge accumulation rides the identical
    single-source pass as the node kernel — the shortest-path-DAG edge
    (v, w) receives the same contribution that back-propagates to v.

    Same class-(b) custom-operator shape as kg_betweenness: a
    grouped-map kernel, sequential per conversation graph (bounded by
    the entity domain), distributed across conversations on ONE
    conv_id exchange (plan-gated with the other graph kernels).
    Deterministic: sorted node/neighbour iteration fixes the float
    accumulation order (re-run pinned bit-exact); pytest pins it
    against an independent per-pair path-fraction formulation within
    1e-9 plus the exact invariant sum_e ebc(e) = sum_pairs d(s, t)."""
    e = _sym_edges(_triples_table(spark, sf)).select("conv_id", "s", "o")

    def per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        conv = pdf["conv_id"].iloc[0]
        adj: dict = {}
        for s, o in zip(pdf["s"], pdf["o"]):
            adj.setdefault(s, set()).add(o)
        nodes = sorted(adj)
        adj = {v: sorted(adj[v]) for v in nodes}
        ebc = _brandes_ebc(nodes, adj)
        keys = sorted(ebc)
        return pd.DataFrame(
            {
                "conv_id": [conv] * len(keys),
                "ent_a": [a for a, _ in keys],
                "ent_b": [b for _, b in keys],
                "edge_betweenness": np.array(
                    [ebc[k] for k in keys], dtype=np.float64
                ),
            }
        )

    return e.groupBy("conv_id").applyInPandas(
        per_conv,
        "conv_id string, ent_a string, ent_b string,"
        " edge_betweenness double",
    )


def edge_betweenness_pairs_py(edges: pd.DataFrame) -> pd.DataFrame:
    """Independent pair-sum edge-betweenness twin for the golden test:
    ebc(u, v) = sum over unordered reachable pairs {s, t} of
    sigma_st(u -> v)/sigma_st, where a DAG edge u -> v lies on an s-t
    shortest path iff d_s(u) + 1 + d_t(v) = d_s(t) and then carries
    sigma_s(u) * sigma_t(v) of the sigma_s(t) paths — per-pair
    quotients summed in pair order, a different accumulation order
    from Brandes' back-propagation. ``edges`` has columns (conv_id,
    subj, obj)."""
    from collections import deque

    rows = []
    e = edges[edges["subj"] != edges["obj"]]
    for conv, grp in e.groupby("conv_id"):
        adj: dict = {}
        for s, o in zip(grp["subj"], grp["obj"]):
            adj.setdefault(s, set()).add(o)
            adj.setdefault(o, set()).add(s)
        nodes = sorted(adj)
        und = sorted(
            {(min(a, b), max(a, b)) for a in adj for b in adj[a]}
        )

        def bfs(src):
            dist = {src: 0}
            sigma = {src: 1}
            q = deque([src])
            while q:
                v = q.popleft()
                for w in sorted(adj[v]):
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        sigma[w] = 0
                        q.append(w)
                    if dist[w] == dist[v] + 1:
                        sigma[w] += sigma[v]
            return dist, sigma

        sp = {v: bfs(v) for v in nodes}
        ebc = {eu: 0.0 for eu in und}
        for i, s in enumerate(nodes):
            ds, ss = sp[s]
            for t in nodes[i + 1 :]:
                if t not in ds:
                    continue
                dt, st = sp[t]
                tot = ss[t]
                for a, b in und:
                    for u, v in ((a, b), (b, a)):
                        if (
                            u in ds
                            and v in dt
                            and ds[u] + 1 + dt[v] == ds[t]
                        ):
                            ebc[(a, b)] += ss[u] * st[v] / tot
        for (a, b), x in ebc.items():
            rows.append((conv, a, b, x))
    return pd.DataFrame(
        rows, columns=["conv_id", "ent_a", "ent_b", "edge_betweenness"]
    )


@register(
    "kg_modularity",
    # Newman modularity of the strong-component partition measured
    # over the FULL distinct edge set: with m edges, e_c intra-edges
    # and d_c degree sums all exact integers, Q collapses to
    # (4m*sum(e_c) - sum(d_c^2)) / (4m^2) — one division. The full
    # edge CTE is freshly named (fo/fl/...) because _ALLPAIRS_SQL
    # already owns t/e/nodes/r/sp.
    _ALLPAIRS_SQL
    + ", lab AS (SELECT conv_id, src, MIN(node) AS lbl FROM sp "
    " GROUP BY 1, 2), "
    "fo AS (SELECT DISTINCT conv_id, LEAST(subj, obj) AS a, "
    " GREATEST(subj, obj) AS b FROM t WHERE subj <> obj), "
    "fl AS (SELECT fo.conv_id, la.lbl AS ca, lb.lbl AS cb FROM fo "
    " JOIN lab la ON la.conv_id = fo.conv_id AND la.src = fo.a "
    " JOIN lab lb ON lb.conv_id = fo.conv_id AND lb.src = fo.b), "
    "mm AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS m FROM fl "
    " GROUP BY 1), "
    "dg AS (SELECT conv_id, c, CAST(SUM(d) AS BIGINT) AS dc, "
    " CAST(SUM(i) AS BIGINT) AS ec FROM ("
    "  SELECT conv_id, ca AS c, 1 AS d, "
    "   CASE WHEN ca = cb THEN 1 ELSE 0 END AS i FROM fl "
    "  UNION ALL SELECT conv_id, cb, 1, 0 FROM fl WHERE ca <> cb "
    "  UNION ALL SELECT conv_id, ca, 1, 0 FROM fl WHERE ca = cb) "
    " GROUP BY 1, 2), "
    "qn AS (SELECT dg.conv_id, CAST(COUNT(*) AS BIGINT) AS ncomp, "
    " CAST(SUM(4 * mm.m * ec - dc * dc) AS BIGINT) AS qnum "
    " FROM dg JOIN mm USING (conv_id) GROUP BY 1) "
    "SELECT qn.conv_id, ncomp AS n_comps, m AS m_edges, "
    "printf('%.6f', ROUND(CAST(qnum AS DOUBLE) "
    " / CAST(4 * m * m AS DOUBLE), 6)) AS modularity "
    "FROM qn JOIN mm ON mm.conv_id = qn.conv_id WHERE m > 0",
)
def kg_modularity(spark, sf):
    """Newman modularity of the strong-component partition, measured
    over the conversation's FULL distinct edge set — does the
    confidence-thresholded backbone's community structure actually
    explain the raw graph (Q near 0: the weak edges wash the partition
    out; Q large: the backbone found real modules)? This is the
    quality score for the partition ``kg_components`` reports and the
    quantity Girvan-Newman splitting (``kg_edge_betweenness``)
    optimizes — closing the community-analysis loop.

    Float discipline: with m full edges, e_c intra-community edges and
    d_c community degree sums (all exact BIGINTs — intra edges
    contribute 2 to their community's degree), Q = sum_c (e_c/m -
    (d_c/2m)^2) collapses to (4m*sum e_c - sum d_c^2) / (4m^2): every
    moment integer, ONE IEEE division under ROUND + %.6f.

    Scale shape: component labels are a rollup of the memoized
    all-pairs BFS; the full edge set joins to labels on (conv_id,
    node); all shuffles key conv_id-first on the materialized triple
    table's co-partitioning."""
    lab = (
        _strong_allpairs_dist(spark, sf)
        .groupBy("conv_id", "src")
        .agg(F.min("node").alias("lbl"))
    )
    fo = _oriented_edges(_triples_table(spark, sf))
    la = lab.select(
        "conv_id", F.col("src").alias("a"), F.col("lbl").alias("ca")
    )
    lb = lab.select(
        "conv_id", F.col("src").alias("b"), F.col("lbl").alias("cb")
    )
    fl = fo.join(la, ["conv_id", "a"]).join(lb, ["conv_id", "b"])
    mm = fl.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    intra = F.when(F.col("ca") == F.col("cb"), 1).otherwise(0)
    parts = (
        fl.select(
            "conv_id",
            F.col("ca").alias("c"),
            F.lit(1).alias("d"),
            intra.alias("i"),
        )
        .unionAll(
            fl.filter(F.col("ca") != F.col("cb")).select(
                "conv_id",
                F.col("cb").alias("c"),
                F.lit(1).alias("d"),
                F.lit(0).alias("i"),
            )
        )
        .unionAll(
            fl.filter(F.col("ca") == F.col("cb")).select(
                "conv_id",
                F.col("ca").alias("c"),
                F.lit(1).alias("d"),
                F.lit(0).alias("i"),
            )
        )
    )
    dg = parts.groupBy("conv_id", "c").agg(
        F.sum("d").cast("long").alias("dc"),
        F.sum("i").cast("long").alias("ec"),
    )
    qn = dg.join(mm, "conv_id").groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("ncomp"),
        F.sum(
            4 * F.col("m") * F.col("ec") - F.col("dc") * F.col("dc")
        )
        .cast("long")
        .alias("qnum"),
    )
    m = F.col("m")
    return (
        qn.join(mm, "conv_id")
        .filter(m > 0)
        .select(
            "conv_id",
            F.col("ncomp").alias("n_comps"),
            m.alias("m_edges"),
            F.format_string(
                "%.6f",
                F.round(
                    F.col("qnum").cast("double")
                    / (4 * m * m).cast("double"),
                    6,
                ),
            ).alias("modularity"),
        )
    )


# ------------------------------------------------- Katz centrality ----

@register(
    "kg_katz",
    # Bounded-horizon Katz centrality with a DYADIC attenuation
    # (alpha = 1/4, 4 hops): walk counts per length are exact BIGINTs
    # from three chained equi-joins over the symmetrized edge set, so
    # katz256 = 64*w1 + 16*w2 + 4*w3 + w4 = 256 * sum alpha^k * w_k is
    # an exact integer and the final katz value is the exact dyadic
    # division katz256/256 — no float ever enters until one division
    # by a power of two.
    f"WITH t AS ({_TRIPLES_SQL}), e AS ({_EDGES_SYM_SQL}), "
    "w1 AS (SELECT conv_id, o AS node, CAST(COUNT(*) AS BIGINT) AS w "
    " FROM e GROUP BY conv_id, o), "
    "w2 AS (SELECT e.conv_id, e.o AS node, CAST(SUM(w1.w) AS BIGINT) AS w "
    " FROM e JOIN w1 ON w1.conv_id = e.conv_id AND w1.node = e.s "
    " GROUP BY e.conv_id, e.o), "
    "w3 AS (SELECT e.conv_id, e.o AS node, CAST(SUM(w2.w) AS BIGINT) AS w "
    " FROM e JOIN w2 ON w2.conv_id = e.conv_id AND w2.node = e.s "
    " GROUP BY e.conv_id, e.o), "
    "w4 AS (SELECT e.conv_id, e.o AS node, CAST(SUM(w3.w) AS BIGINT) AS w "
    " FROM e JOIN w3 ON w3.conv_id = e.conv_id AND w3.node = e.s "
    " GROUP BY e.conv_id, e.o) "
    "SELECT w1.conv_id, w1.node AS entity, w1.w AS walks_1, "
    "COALESCE(w2.w, 0) AS walks_2, COALESCE(w3.w, 0) AS walks_3, "
    "COALESCE(w4.w, 0) AS walks_4, "
    "printf('%.6f', ROUND(CAST(64 * w1.w + 16 * COALESCE(w2.w, 0) "
    " + 4 * COALESCE(w3.w, 0) + COALESCE(w4.w, 0) AS DOUBLE) / 256.0, 6)) "
    " AS katz "
    "FROM w1 "
    "LEFT JOIN w2 ON w2.conv_id = w1.conv_id AND w2.node = w1.node "
    "LEFT JOIN w3 ON w3.conv_id = w1.conv_id AND w3.node = w1.node "
    "LEFT JOIN w4 ON w4.conv_id = w1.conv_id AND w4.node = w1.node",
)
def kg_katz(spark, sf):
    """Bounded-horizon Katz centrality (alpha = 1/4, 4 hops) per
    conversation entity — the walk-counting centrality between
    ``kg_degree``'s horizon-1 and ``kg_pagerank``'s infinite-horizon
    views: katz(v) = sum_k alpha^k * (walks of length k ending at v),
    rewarding entities many short paths reach. With the entity domain
    dictionary-bounded, four hops saturate most conversation graphs
    (the kg_reach horizon argument).

    Float discipline: walk counts are exact BIGINTs (three chained
    joins over the distinct symmetrized edge set — bounded by conv x
    entity-domain x degree^3); alpha = 1/4 is DYADIC, so 256*katz =
    64*w1 + 16*w2 + 4*w3 + w4 is an exact integer and the one closing
    division by 256.0 (a power of two) is exact in IEEE-754 — the
    emitted katz value carries ZERO rounding error on both engines.
    Nodes unreachable at a horizon contribute exact zeros via the
    outer joins.

    Scale shape: every join and aggregation keys conv_id-first over
    the materialized triple table's co-partitioning (the kg_reach
    fixed-iteration shape with aggregation instead of MIN); the three
    hop tables are dimension-sized (conv x entities). No in-loop
    driver barriers — the four hops are a FIXED unrolled plan.

    Cites SURVEY.md §2.3 (graph analytics family) — reference
    file:line citations impossible (reference dir empty, SURVEY §0)."""
    e = _sym_edges(_triples_table(spark, sf))
    w1 = e.groupBy("conv_id", F.col("o").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("w")
    )

    def hop(prev: DataFrame) -> DataFrame:
        # frontier columns RENAMED before the join — the kg_reach
        # attribute-ambiguity discipline for iterative self-joins
        p = prev.select(
            F.col("conv_id").alias("p_conv"),
            F.col("node").alias("src"),
            F.col("w").alias("pw"),
        )
        return (
            e.join(
                p,
                (F.col("conv_id") == F.col("p_conv"))
                & (F.col("s") == F.col("src")),
            )
            .select("conv_id", F.col("o").alias("node"), "pw")
            .groupBy("conv_id", "node")
            .agg(F.sum("pw").cast("long").alias("w"))
        )

    w2, w3 = hop(w1), None
    w3 = hop(w2)
    w4 = hop(w3)
    out = w1.select("conv_id", "node", F.col("w").alias("walks_1"))
    for i, wk in ((2, w2), (3, w3), (4, w4)):
        out = out.join(
            wk.select(
                "conv_id", "node", F.col("w").alias(f"walks_{i}")
            ),
            ["conv_id", "node"],
            "left",
        ).withColumn(
            f"walks_{i}", F.coalesce(F.col(f"walks_{i}"), F.lit(0))
        )
    katz256 = (
        64 * F.col("walks_1")
        + 16 * F.col("walks_2")
        + 4 * F.col("walks_3")
        + F.col("walks_4")
    )
    fmt = lambda x: F.format_string("%.6f", F.round(x, 6))  # noqa: E731
    return out.select(
        "conv_id",
        F.col("node").alias("entity"),
        "walks_1",
        "walks_2",
        "walks_3",
        "walks_4",
        fmt(katz256.cast("double") / F.lit(256.0)).alias("katz"),
    )


# ------------------------------------- hub-normalized link indices ----

@register(
    "kg_hub_indices",
    # Hub Depressed / Hub Promoted / Leicht-Holme-Newman link
    # prediction indices over the SAME common-neighbour pair table as
    # kg_salton_sorensen: counts are exact integers; HDI = c/max(da,db),
    # HPI = c/min(da,db) and LHN = c/(da*db) are ONE correctly-rounded
    # IEEE division each (the LHN denominator an exact integer
    # product) under ROUND + %.6f.
    f"WITH t AS ({_TRIPLES_SQL}), e AS ({_EDGES_SYM_SQL}), "
    "deg AS (SELECT conv_id, s AS node, COUNT(*) AS d FROM e "
    " GROUP BY conv_id, s), "
    "cm AS (SELECT a.conv_id, a.s AS ea, b.s AS eb, COUNT(*) AS c FROM e a "
    " JOIN e b ON b.conv_id = a.conv_id AND b.o = a.o AND a.s < b.s "
    " GROUP BY a.conv_id, a.s, b.s) "
    "SELECT cm.conv_id, cm.ea AS ent_a, cm.eb AS ent_b, "
    "CAST(c AS BIGINT) AS n_common, "
    "printf('%.6f', ROUND(CAST(c AS DOUBLE) "
    " / CAST(GREATEST(da.d, db.d) AS DOUBLE), 6)) AS hdi, "
    "printf('%.6f', ROUND(CAST(c AS DOUBLE) "
    " / CAST(LEAST(da.d, db.d) AS DOUBLE), 6)) AS hpi, "
    "printf('%.6f', ROUND(CAST(c AS DOUBLE) "
    " / CAST(da.d * db.d AS DOUBLE), 6)) AS lhn "
    "FROM cm JOIN deg da ON da.conv_id = cm.conv_id AND da.node = cm.ea "
    "JOIN deg db ON db.conv_id = cm.conv_id AND db.node = cm.eb",
)
def kg_hub_indices(spark, sf):
    """Hub Depressed (HDI), Hub Promoted (HPI), and Leicht-Holme-Newman
    (LHN) link-prediction indices for every same-conversation entity
    pair sharing a neighbour — completing the common-neighbour
    normalization family next to ``kg_neighbor_jaccard`` (union),
    ``kg_salton_sorensen`` (geometric / arithmetic degree means), and
    ``kg_resource_allocation`` (neighbour-degree weighting): HDI
    normalizes by the LARGER degree (punishing hub attachment), HPI by
    the smaller (rewarding it), LHN by the degree product (the
    expected-common-neighbour count under the configuration model).
    The three disagree exactly on hub-attached pairs, which is why a
    link-prediction benchmark reports them side by side.

    Float discipline: common-neighbour and degree counts are exact
    integers off the shared pair table; GREATEST/LEAST of two exact
    integers and the product da*db are exact, so each index is ONE
    correctly-rounded IEEE division spelled identically on both
    engines under ROUND + %.6f.

    Scale shape: identical to kg_salton_sorensen — pairs from the
    distinct symmetrized edge set self-joined on (conv_id,
    shared-neighbour), bounded by convs x entity-domain^2; degrees
    join back on (conv_id, node); every shuffle keys conv_id-first on
    the materialized triple table's co-partitioning."""
    e = _sym_edges(_triples_table(spark, sf))
    deg = e.groupBy("conv_id", F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    b_side = e.select("conv_id", F.col("s").alias("eb"), "o")
    cm = (
        e.select("conv_id", F.col("s").alias("ea"), "o")
        .join(b_side, ["conv_id", "o"])
        .filter(F.col("ea") < F.col("eb"))
        .groupBy("conv_id", "ea", "eb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    da = deg.select(
        "conv_id", F.col("node").alias("ea"), F.col("d").alias("da_d")
    )
    db = deg.select(
        "conv_id", F.col("node").alias("eb"), F.col("d").alias("db_d")
    )
    c = F.col("c")
    fmt = lambda x: F.format_string("%.6f", F.round(x, 6))  # noqa: E731
    return (
        cm.join(da, ["conv_id", "ea"])
        .join(db, ["conv_id", "eb"])
        .select(
            "conv_id",
            F.col("ea").alias("ent_a"),
            F.col("eb").alias("ent_b"),
            c.cast("long").alias("n_common"),
            fmt(
                c.cast("double")
                / F.greatest("da_d", "db_d").cast("double")
            ).alias("hdi"),
            fmt(
                c.cast("double") / F.least("da_d", "db_d").cast("double")
            ).alias("hpi"),
            fmt(
                c.cast("double")
                / (F.col("da_d") * F.col("db_d")).cast("double")
            ).alias("lhn"),
        )
    )


@register("source_xml", _SRC_SQL)
def source_xml(spark, sf):
    """XML source — Spark 4's NATIVE XML datasource (the spark-xml
    package folded into core; no external jar needed, unlike Avro —
    see NOTES env gates), round-tripped: the staging write emits one
    <doc> row element per document and the read parses them back under
    an explicit schema. The oracle reads the SAME rows from the
    parquet view, so a green row proves writer + reader + rowTag
    handling end-to-end. XML remains the interchange format of
    regulatory/publishing corpora (PubMed, patents, TEI), which is
    exactly the kind of raw input a document-ingest pipeline meets.

    Scale shape: one file task per staged shard on read; schema is
    explicit so no inference pass runs at 100 TB."""
    path = _stage_format(spark, sf, "xml")
    return (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema("doc_id long, lang string, source string, n_chars long")
        .load(path)
        .select("doc_id", "lang", "source", "n_chars")
    )

@register(
    "kg_avg_neighbor_degree",
    # Average-neighbor-degree curve knn(k) over the STRONG backbone —
    # the raw co-occurrence graph is near-complete (every node degree
    # n-1, the curve collapses to one vacuous row; see kg_diameter),
    # so the curve is read where the geometry is informative: the
    # above-mean-support edge set (_STRONG_SQL — the exact-integer
    # n * n_edges > tot cut). Within a degree class every node has
    # degree k, so the per-node float mean pools into the EXACT
    # integer ratio sum_nbr_deg / (k * n_nodes): ONE division per row.
    f"WITH t AS ({_TRIPLES_SQL}), "
    f"{_STRONG_SQL}, "
    "deg AS (SELECT conv_id, s AS node, CAST(COUNT(*) AS BIGINT) AS d "
    " FROM e GROUP BY 1, 2), "
    "snd AS (SELECT e.conv_id, e.s AS node, "
    "  CAST(SUM(dd.d) AS BIGINT) AS snd FROM e "
    " JOIN deg dd ON dd.conv_id = e.conv_id AND dd.node = e.o "
    " GROUP BY 1, 2), "
    "k AS (SELECT du.d AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes, "
    "  CAST(SUM(snd.snd) AS BIGINT) AS s_nbr FROM snd "
    " JOIN deg du ON du.conv_id = snd.conv_id AND du.node = snd.node "
    " GROUP BY 1) "
    "SELECT degree, n_nodes, s_nbr AS sum_neighbor_deg, "
    "printf('%.6f', ROUND(CAST(s_nbr AS DOUBLE) "
    " / CAST(degree * n_nodes AS DOUBLE), 6)) AS knn "
    "FROM k",
)
def kg_avg_neighbor_degree(spark, sf):
    """Average-neighbor-degree curve knn(k) of the strong-backbone
    graph — ``kg_assortativity``'s mixing coefficient unrolled into
    the curve analysts actually read (Pastor-Satorras et al.): for
    each degree class k, the mean degree of the neighbors of degree-k
    nodes. A rising curve = assortative (hubs wire to hubs), falling =
    disassortative (hubs fan out to leaves), and the SHAPE localizes
    where the mixing happens in a way one pooled r cannot. Read over
    the strong backbone (above-mean-support edges, the kg_diameter
    cut) because the raw co-occurrence graph is near-complete and its
    curve is the single vacuous row knn(n-1) = n-1.

    Float discipline: within a degree class every node has degree
    exactly k, so the mean of per-node means collapses to
    sum_neighbor_deg / (k * n_nodes) — a ratio of exact BIGINTs (the
    per-degree-class pooling is WHY no per-node float ever exists) and
    ONE correctly-rounded IEEE division per row under ROUND + %.6f;
    the exact integer numerator is emitted alongside.

    Scale shape: derives from the memoized checkpointed strong edge
    set (``_strong_edges_cached`` — bounded by convs × entity-domain²,
    never turn volume), symmetrized; the degree table joins back on
    (conv_id, node) — co-partitioned with the edge set's own key — and
    the final rollup is degree-domain sized (a handful of rows)."""
    strong = _strong_edges_cached(spark, sf)
    e = _sym_of_canon(strong)
    deg = e.groupBy("conv_id", F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    snd = (
        e.join(
            deg.select(
                F.col("conv_id").alias("oc"),
                F.col("node").alias("on"),
                F.col("d").alias("nbr_d"),
            ),
            (F.col("oc") == F.col("conv_id")) & (F.col("on") == F.col("o")),
        )
        .groupBy("conv_id", F.col("s").alias("node"))
        .agg(F.sum("nbr_d").cast("long").alias("snd"))
    )
    k = (
        snd.join(deg, ["conv_id", "node"])
        .groupBy(F.col("d").alias("degree"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("snd").cast("long").alias("s_nbr"),
        )
    )
    return k.select(
        "degree",
        "n_nodes",
        F.col("s_nbr").alias("sum_neighbor_deg"),
        F.format_string(
            "%.6f",
            F.round(
                F.col("s_nbr").cast("double")
                / (F.col("degree") * F.col("n_nodes")).cast("double"),
                6,
            ),
        ).alias("knn"),
    )


@register(
    "kg_clustering_curve",
    # Local-clustering-by-degree curve c(k) over the STRONG backbone
    # (the raw co-occurrence graph is near-complete — see
    # kg_avg_neighbor_degree). Per-node triangles come from the
    # canonical-edge triple join (each triangle x<y<z counted once,
    # then credited to all three corners); within a degree class every
    # node has k(k-1)/2 wedges, so the mean of per-node clustering
    # pools into the EXACT integer ratio 2*sum_tri / (k(k-1)*n_k):
    # all counts BIGINT, ONE division per row. Degree-1 nodes have no
    # wedges and are excluded by the same integer guard on both sides.
    f"WITH t AS ({_TRIPLES_SQL}), "
    f"{_STRONG_SQL}, "
    "tn AS (SELECT e1.conv_id, e1.a AS x, e1.b AS y, e2.b AS z "
    " FROM sp0 e1 "
    " JOIN sp0 e2 ON e2.conv_id = e1.conv_id AND e2.a = e1.a "
    "  AND e2.b > e1.b "
    " JOIN sp0 e3 ON e3.conv_id = e1.conv_id AND e3.a = e1.b "
    "  AND e3.b = e2.b), "
    "tc AS (SELECT conv_id, node, CAST(COUNT(*) AS BIGINT) AS tri FROM ("
    " SELECT conv_id, x AS node FROM tn "
    " UNION ALL SELECT conv_id, y FROM tn "
    " UNION ALL SELECT conv_id, z FROM tn) GROUP BY 1, 2), "
    "dg AS (SELECT conv_id, s AS node, CAST(COUNT(*) AS BIGINT) AS d "
    " FROM e GROUP BY 1, 2), "
    "k AS (SELECT d AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes, "
    "  CAST(SUM(COALESCE(tc.tri, 0)) AS BIGINT) AS s_tri FROM dg "
    " LEFT JOIN tc ON tc.conv_id = dg.conv_id AND tc.node = dg.node "
    " WHERE dg.d >= 2 GROUP BY 1) "
    "SELECT degree, n_nodes, s_tri AS sum_triangles, "
    "printf('%.6f', ROUND(CAST(2 * s_tri AS DOUBLE) "
    " / CAST(degree * (degree - 1) * n_nodes AS DOUBLE), 6)) AS ck "
    "FROM k",
)
def kg_clustering_curve(spark, sf):
    """Local-clustering-by-degree curve c(k) of the strong-backbone
    graph — ``kg_clustering``'s global coefficient unrolled into the
    degree-resolved curve (the hierarchical-structure fingerprint:
    c(k) falling like a power law is the classical signature of
    modular/hierarchical organization, flat c(k) of degree-independent
    cohesion), read next to ``kg_avg_neighbor_degree``'s knn(k) as the
    standard two-curve structural profile. Over the strong backbone
    for the same reason as knn(k): the raw co-occurrence graph is
    near-complete and every local coefficient degenerates to 1.

    Float discipline: per-node triangle counts come from the
    canonical-edge (a < b) triple join — each triangle counted once
    and credited to its three corners, all exact BIGINTs; within a
    degree class every node has exactly k(k-1)/2 wedges, so the mean
    of per-node clustering coefficients pools into 2*sum_triangles /
    (k(k-1)*n_nodes) — a ratio of exact integers (the pooling is WHY
    no per-node float ever exists) and ONE correctly-rounded IEEE
    division per row under ROUND + %.6f; the exact numerator is
    emitted alongside. Degree-1 nodes (zero wedges) are excluded by
    the identical integer guard on both engines; zero-triangle nodes
    still count in n_nodes (LEFT join + COALESCE — dropping them would
    bias c(k) up).

    Scale shape: derives from the memoized checkpointed strong edge
    set (``_strong_edges_cached``); the triangle join is the bounded
    kg_triangles self-join keyed conv_id-first; the degree table joins
    back on (conv_id, node); the final rollup is degree-domain sized."""
    strong = _strong_edges_cached(spark, sf)
    sc = strong.select("conv_id", "a", "b")
    e1 = sc.select(
        "conv_id", F.col("a").alias("x"), F.col("b").alias("y")
    )
    e2 = sc.select(
        F.col("conv_id").alias("c2"),
        F.col("a").alias("x2"),
        F.col("b").alias("z"),
    )
    e3 = sc.select(
        F.col("conv_id").alias("c3"),
        F.col("a").alias("y3"),
        F.col("b").alias("z3"),
    )
    tn = (
        e1.join(
            e2,
            (F.col("c2") == F.col("conv_id"))
            & (F.col("x2") == F.col("x"))
            & (F.col("z") > F.col("y")),
        )
        .join(
            e3,
            (F.col("c3") == F.col("conv_id"))
            & (F.col("y3") == F.col("y"))
            & (F.col("z3") == F.col("z")),
        )
        .select("conv_id", "x", "y", "z")
    )
    corners = (
        tn.select("conv_id", F.col("x").alias("node"))
        .unionByName(tn.select("conv_id", F.col("y").alias("node")))
        .unionByName(tn.select("conv_id", F.col("z").alias("node")))
    )
    tc = corners.groupBy("conv_id", "node").agg(
        F.count(F.lit(1)).cast("long").alias("tri")
    )
    e = _sym_of_canon(sc)
    dg = e.groupBy("conv_id", F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    k = (
        dg.filter(F.col("d") >= 2)
        .join(tc, ["conv_id", "node"], "left")
        .groupBy(F.col("d").alias("degree"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum(F.coalesce(F.col("tri"), F.lit(0)))
            .cast("long")
            .alias("s_tri"),
        )
    )
    return k.select(
        "degree",
        "n_nodes",
        F.col("s_tri").alias("sum_triangles"),
        F.format_string(
            "%.6f",
            F.round(
                (2 * F.col("s_tri")).cast("double")
                / (
                    F.col("degree")
                    * (F.col("degree") - 1)
                    * F.col("n_nodes")
                ).cast("double"),
                6,
            ),
        ).alias("ck"),
    )
