"""BC2GM-format round trip (reference dataset format parity):
sentences + mentions written in BC2 style (non-space char offsets) must
read back to the exact original spans and surfaces."""

from __future__ import annotations

from reach_banner_spark import schemas


def test_bc2_roundtrip(spark, small_turns, model_path, tmp_path):
    from reach_banner_spark.operators.mentions import detect_mentions, paren_balanced
    from reach_banner_spark.sources import bc2gm

    turns_pdf, _ = small_turns
    turns_pdf = turns_pdf.iloc[:200].reset_index(drop=True)
    turns = spark.createDataFrame(turns_pdf, schema=schemas.TURNS)
    mentions = detect_mentions(turns, model_path).filter(paren_balanced("surface"))

    sdir = str(tmp_path / "sentences")
    mdir = str(tmp_path / "mentions")
    bc2gm.write_sentences(turns, sdir)
    bc2gm.write_mentions(mentions, turns, mdir)

    # sentences round-trip: text preserved bit-for-bit under stable order
    back_t = (
        bc2gm.read_sentences(spark, sdir)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want_t = (
        turns_pdf[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert back_t["text"].tolist() == want_t["text"].tolist()

    # mentions round-trip: exact spans + surfaces
    back_m = bc2gm.read_mentions(spark, mdir, turns).toPandas()
    want_m = mentions.select(
        "conv_id", "turn_idx", "begin_char", "end_char", "surface"
    ).toPandas()
    key = ["conv_id", "turn_idx", "begin_char", "end_char", "surface"]
    bs = {tuple(r) for r in back_m[key].itertuples(index=False, name=None)}
    ws = {tuple(r) for r in want_m[key].itertuples(index=False, name=None)}
    assert bs == ws, (len(bs - ws), len(ws - bs))


def test_altgene_roundtrip_and_credit(spark, small_turns, model_path, tmp_path):
    """ALTGENE.eval round trip: alternative spans written in BC2 format read
    back associated to their gold by overlap, and a prediction matching only
    an alternative flips from FP to TP in the harness."""
    import pandas as pd

    from reach_banner_spark.operators.mentions import detect_mentions, paren_balanced
    from reach_banner_spark.operators.train import eval_exact_span
    from reach_banner_spark.sources import bc2gm

    turns_pdf, _ = small_turns
    turns_pdf = turns_pdf.iloc[:200].reset_index(drop=True)
    turns = spark.createDataFrame(turns_pdf, schema=schemas.TURNS)
    gold = (
        detect_mentions(turns, model_path)
        .filter(paren_balanced("surface"))
        .select("conv_id", "turn_idx", "begin_char", "end_char", "surface")
    )
    gold_pdf = gold.toPandas()
    assert len(gold_pdf) > 0

    # synthesize one boundary-variant alternative per gold: shrink the span
    # one char from the right (valid whenever the mention is >= 2 chars, and
    # always overlaps its gold), skipping shrunk spans that collide with an
    # existing gold span so the TP arithmetic below stays exact
    gold_spans = {
        tuple(r)
        for r in gold_pdf[
            ["conv_id", "turn_idx", "begin_char", "end_char"]
        ].itertuples(index=False, name=None)
    }
    alt_rows = []
    for c, t, b, e, _s in gold_pdf.itertuples(index=False, name=None):
        if e - b >= 2 and (c, int(t), int(b), int(e) - 1) not in gold_spans:
            alt_rows.append((c, int(t), int(b), int(e) - 1))
    assert alt_rows, "fixture produced no shrinkable spans"
    alt_pdf = pd.DataFrame(
        alt_rows, columns=["conv_id", "turn_idx", "begin_char", "end_char"]
    )

    # write the alternatives in BC2 ALTGENE format (same writer as GENE)
    alt_m = spark.createDataFrame(
        alt_pdf.assign(surface="x"),
        "conv_id string, turn_idx int, begin_char int, end_char int, surface string",
    )
    adir = str(tmp_path / "altgene")
    bc2gm.write_mentions(alt_m, turns, adir)

    back_alt = bc2gm.read_alt_mentions(spark, adir, turns, gold).toPandas()
    # every written alternative overlaps its gold -> association found
    assert len(back_alt) >= len(alt_pdf)

    # predictions: golds with the FIRST alternative's span swapped in —
    # plain exact-span eval loses that mention; alt credit recovers it
    swap = alt_pdf.iloc[0]  # alt span = gold span with end_char - 1
    pred_pdf = gold_pdf[["conv_id", "turn_idx", "begin_char", "end_char"]].copy()
    hit = (
        (pred_pdf["conv_id"] == swap["conv_id"])
        & (pred_pdf["turn_idx"] == swap["turn_idx"])
        & (pred_pdf["begin_char"] == swap["begin_char"])
        & (pred_pdf["end_char"] == swap["end_char"] + 1)
    )
    assert hit.sum() == 1
    pred_pdf.loc[hit, "end_char"] = int(swap["end_char"])

    plain = eval_exact_span(pred_pdf, gold_pdf)
    with_alt = eval_exact_span(pred_pdf, gold_pdf, back_alt)
    assert plain["tp"] == len(gold_pdf) - 1
    assert with_alt["tp"] == len(gold_pdf)
    assert with_alt["recall"] == 1.0 and plain["recall"] < 1.0
