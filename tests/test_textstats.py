

def test_tfidf_keywords_ranking_and_determinism(spark):
    from gobblin_spark.operators.textstats import tfidf_keywords
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat cat cat"),
            (2, "dogs and cats and dogs"),
            (3, None),
            (4, "xy"),  # all tokens under min_len
        ],
        "doc_id long, text string",
    )
    out = tfidf_keywords(docs, k=3)
    rows = {(r["doc_id"], r["rk"]): r for r in out.collect()}
    # doc 1: 'cat' tf=3 df=1 dominates; ties at score resolve by term asc
    assert rows[(1, 1)]["term"] == "cat" and rows[(1, 1)]["tf"] == 3
    # 'the' tf=2 df=1 -> 8M beats the 4M ties; then term-asc among 4M ties
    assert rows[(1, 2)]["term"] == "the" and rows[(1, 3)]["term"] == "mat"
    # integer scoring: N=4, scale=1e6 -> score = tf * (4e6 // df)
    assert rows[(1, 1)]["score"] == 3 * (4_000_000 // 1)
    # docs with no eligible tokens emit nothing but don't break the plan
    assert not any(d in (3, 4) for d, _ in rows)
    # determinism: two runs identical
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out.collect()))
