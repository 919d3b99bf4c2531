"""operators/html_extract — stdlib HTML→text baseline invariants."""

from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import html_extract as hx


def test_skip_subtrees_blocks_entities_and_collapse():
    h = ("<html><head><title>t</title><style>p{}</style></head><body>"
         "<h1>A   Title</h1><script>var x;</script>"
         "<p>one <b>two</b>&amp;three</p><ul><li>a</li><li>b</li></ul>"
         "<noscript>hidden</noscript></body></html>")
    assert hx.html_to_text(h) == "A Title\none two&three\na\nb"


def test_nested_skip_and_malformed_markup():
    # unclosed tags + a script nested inside a skipped head
    h = "<head><script>if (a<b) {}</script><p>leaks?</head>seen"
    assert hx.html_to_text(h) == "seen"
    assert hx.html_to_text("") == ""
    assert hx.html_to_text("plain no markup") == "plain no markup"


def test_extract_text_operator(spark):
    df = spark.createDataFrame(
        [(1, "<body><p>hello</p><div>world</div></body>"), (2, None)],
        "id long, html string")
    out = {r.id: r.text for r in hx.extract_text(df).collect()}
    assert out == {1: "hello\nworld", 2: None}
