

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


def test_chunk_documents_cover_and_overlap(spark):
    from gobblin_spark.operators.textstats import chunk_documents

    text = "".join(chr(ord("a") + i % 26) for i in range(25))  # len 25
    docs = spark.createDataFrame(
        [(1, text), (2, "short"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_chars=10, overlap=3, id_col="doc_id")
    rows = {(r["doc_id"], r["chunk_id"]): r["chunk_text"] for r in out.collect()}
    # len 25, chunk 10, stride 7 -> chunks at 1,8,15,22 => ceil((25-10)/7)+1 = 4
    d1 = [rows[(1, i)] for i in range(4)]
    assert (1, 4) not in rows
    assert d1[0] == text[0:10] and d1[1] == text[7:17]
    assert d1[2] == text[14:24] and d1[3] == text[21:25]
    # reconstruction: stripping each overlap re-yields the document
    rebuilt = d1[0] + "".join(c[3:] for c in d1[1:])
    assert rebuilt == text
    # short/empty/null docs survive as exactly one chunk
    assert rows[(2, 0)] == "short"
    assert rows[(3, 0)] == "" and rows[(4, 0)] == ""


def test_chunk_documents_validation(spark):
    import pytest as _pytest

    from gobblin_spark.operators.textstats import chunk_documents

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_chars=10, overlap=10)


def test_token_vocabulary_rank_and_ties(spark):
    from gobblin_spark.operators.textstats import token_vocabulary

    docs = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a c! C, b")], "doc_id long, text string"
    )
    # counts: a=3, b=4, c=3 (case-folded, punctuation split)
    out = [
        (r["token"], r["n_occurrences"], r["rank"])
        for r in token_vocabulary(docs, k=2).collect()
    ]
    assert out == [("b", 4, 1), ("a", 3, 2)]  # tie a/c broken by token asc
