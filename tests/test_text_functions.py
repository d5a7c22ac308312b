"""Unit tests for text-analysis Column builders not fully covered by the
oracle queries (BPE estimate, tokenizer edges, lang scoring)."""

from pyspark.sql import functions as F

from edna_dbt_library_spark.functions.text import (
    approx_bpe_token_count,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    tokens,
)


def one(spark, text, col_builder):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(col_builder(F.col("t")).alias("v")).collect()[0]["v"]


def test_tokens_edges(spark):
    assert one(spark, "  The  quick   fox ", lambda c: tokens(c)) == ["the", "quick", "fox"]
    assert one(spark, "", lambda c: token_count(c)) == 0
    assert one(spark, "one", lambda c: token_count(c)) == 1


def test_approx_bpe_counts_fragments(spark):
    # pure words: one fragment per word
    assert one(spark, "hello world", approx_bpe_token_count) == 2
    # punctuation splits off as its own fragment
    n = one(spark, "hello, world!", approx_bpe_token_count)
    assert n == 4  # hello , world !
    # digits/letters boundaries split
    assert one(spark, "abc123", approx_bpe_token_count) == 2
    # very long words get a length penalty (> 1 token per 4 chars-ish)
    long_word = "a" * 24
    assert one(spark, long_word, approx_bpe_token_count) > 1
    assert one(spark, "", approx_bpe_token_count) == 0


def test_fingerprint_normalizes(spark):
    a = one(spark, "Hello,   World!", lambda c: fingerprint(c))
    b = one(spark, "hello world", lambda c: fingerprint(c))
    c = one(spark, "HELLO  WORLD", lambda c: fingerprint(c))
    assert a == b == c
    assert a != one(spark, "hello worlds", lambda c: fingerprint(c))


def test_lang_id_basics(spark):
    assert one(spark, "the cat and the dog of a king", lang_id) == "en"
    assert one(spark, "der hund und die katze ist ein tier", lang_id) == "de"
    assert one(spark, "xyzzy plugh qwerty", lang_id) == "und"


def test_quality_score_range_and_monotonicity(spark):
    short = one(spark, "x", quality_score)
    decent = one(spark, "the cat and the dog walked to the house in a fine morning " * 10, quality_score)
    assert 0.0 <= short <= 1.0 and 0.0 <= decent <= 1.0
    assert decent > short


def test_pii_redact_all_kinds(spark):
    from edna_dbt_library_spark.functions.text import pii_redact

    got = one(spark, "mail a.b+c@ex.co.uk, host 10.0.3.7, call (555) 123-4567", pii_redact)
    assert got == "mail <EMAIL>, host <IP>, call <PHONE>"


def test_pii_redact_phone_shapes_and_non_matches(spark):
    from edna_dbt_library_spark.functions.text import pii_redact

    assert one(spark, "+1 555 867 5309", pii_redact) == "<PHONE>"
    assert one(spark, "123-456-7890 ok", pii_redact) == "<PHONE> ok"
    # 16-digit run (card-like) and short numbers are NOT phones
    assert one(spark, "num 1234567890123456 qty 123", pii_redact) == "num 1234567890123456 qty 123"
    # email is consumed before phone/ip rules can bite its digits
    assert one(spark, "x 123-456-7890@d.com y", pii_redact) == "x <EMAIL> y"


def test_pii_redact_is_idempotent(spark):
    from edna_dbt_library_spark.functions.text import pii_redact

    once = one(spark, "a@b.io at 1.2.3.4 tel 555-867-5309", pii_redact)
    twice = one(spark, once, pii_redact)
    assert once == twice == "<EMAIL> at <IP> tel <PHONE>"


def test_pii_flags(spark):
    from edna_dbt_library_spark.functions.text import pii_flags
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a@b.io only",)], "t string")
    row = df.select([v.alias(k) for k, v in pii_flags(F.col("t")).items()]).collect()[0]
    assert row["has_email"] and not row["has_ip"] and not row["has_phone"]


def test_strip_html_cases(spark):
    from edna_dbt_library_spark.functions.text import strip_html
    from pyspark.sql import functions as F

    cases = {
        "<p>hello <b>world</b></p>": "hello world",
        "<script>var x = '<p>sneaky</p>';</script>after": "after",
        "<style>p{}</style>text<!-- note -->": "text",
        "a&amp;b &lt;c&gt; it&#39;s &quot;q&quot;&nbsp;end": 'a&b <c> it\'s "q" end',
        # &amp;lt; decodes to the LITERAL &lt; (never double-decodes)
        "x &amp;lt; y": "x &lt; y",
        "<div>one</div><div>two</div>": "one two",
        "no markup at all": "no markup at all",
        "unterminated <script>rest": "unterminated rest",
        # bare angle brackets in prose/math are NOT tags: the catch-all
        # requires a tag-like start, so the span between them survives
        # (round-5 ADVICE: '<[^>]+>' used to swallow ' y and z ')
        "x < y and z > w": "x < y and z > w",
        "cost<= 4 or >= 2": "cost<= 4 or >= 2",
        "2 < 3, but <em>this</em> is a tag": "2 < 3, but this is a tag",
        "": "",
    }
    df = spark.createDataFrame([(t,) for t in cases], "t string")
    got = [r["c"] for r in df.select(strip_html("t").alias("c")).collect()]
    assert got == list(cases.values())
    # NULL propagates; zero Python in the plan
    nul = spark.createDataFrame([(None,)], "t string")
    assert nul.select(strip_html("t").alias("c")).collect()[0]["c"] is None
    plan = df.select(strip_html("t"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
