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
