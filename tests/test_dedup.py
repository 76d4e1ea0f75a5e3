

def test_dedup_funnel_stage_attribution(spark):
    """Each stage catches exactly its own class: byte-identical copies
    at 'exact', NFC/whitespace variants at 'nfc', high-Jaccard
    near-dups at 'near'; unique docs and all canonical (min-id) group
    representatives are 'kept'. Null text is excluded."""
    from tantalus_spark.datapipe.dedup import dedup_funnel

    shared = ("the quick brown fox jumps over the lazy dog while "
              "seventeen astronomers measure parallax angles at dawn")
    rows = [
        (1, shared),                         # canonical of 1/2/3/4
        (2, shared),                         # exact dup of 1
        (3, shared + "  "),                  # whitespace variant -> nfc
        (4, shared + " tonight"),            # near-dup of 1
        (5, "completely different text about catalyst optimizer "
            "rules and adaptive query execution in modern engines"),
        (6, None),                           # excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_funnel(df, threshold=0.2, n=3, max_shingle_freq=None)
    got = {r["doc_id"]: r["stage"] for r in out.collect()}
    out.unpersist()
    assert got == {1: "kept", 2: "exact", 3: "nfc", 4: "near",
                   5: "kept"}, got
