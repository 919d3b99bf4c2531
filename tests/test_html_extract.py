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


def test_main_content_drops_boilerplate():
    from metadata_enhanced_pretrain_datapipeline_spark.operators.html_extract import (
        html_main_content,
    )

    page = ('<html><body>'
            '<div><a href="#">Home</a> <a href="#">About</a></div>'
            '<p>This is a long enough article paragraph to keep here.</p>'
            '<ul><li><a href="#">tag1</a></li><li><a href="#">tag2</a>'
            '</li></ul>'
            '<p>Short.</p>'
            '<div><a href="#">Privacy policy</a> <a href="#">Terms of '
            'service and conditions</a></div>'
            '</body></html>')
    out = html_main_content(page)
    assert out == "This is a long enough article paragraph to keep here."
    # the long footer is >= 25 chars but link-dominated -> dropped
    assert "Privacy" not in out and "tag1" not in out


def test_main_content_density_boundary_and_edges():
    from metadata_enhanced_pretrain_datapipeline_spark.operators.html_extract import (
        html_main_content,
    )

    # anchor 19 / total 69 = 0.275 <= 0.3 -> kept
    mixed = ('<p>Read <a href="#">the related article</a> and the longer '
             'discussion that follows here</p>')
    assert html_main_content(mixed).startswith("Read the related")
    # push density past the threshold -> dropped
    linky = ('<p><a href="#">mostly anchor text in this longer block '
             'here</a> tail</p>')
    assert html_main_content(linky) == ""
    assert html_main_content("") == ""
    assert html_main_content("<p></p><div></div>") == ""
    # skip subtrees contribute nothing even with anchors
    assert html_main_content(
        "<script>var a = 'a long fake paragraph of code';</script>") == ""


def test_main_content_unclosed_anchor_does_not_poison_blocks():
    """html.parser synthesizes no end tags: one unclosed <a> used to
    leave _a_depth stuck > 0, marking every later block 100%-link and
    dropping the rest of the article (ADVICE r11). A block boundary
    now implicitly closes the anchor."""
    from metadata_enhanced_pretrain_datapipeline_spark.operators.html_extract import (
        html_main_content,
    )

    page = ('<body>'
            '<div><a href="#">Home nav that never closes</div>'
            '<p>This article paragraph is long enough to keep around.</p>'
            '<p>And this second paragraph also clears the threshold.</p>'
            '</body>')
    out = html_main_content(page)
    assert "long enough to keep" in out
    assert "second paragraph also clears" in out
    assert "Home nav" not in out  # the nav block itself stays link-dominated


def test_main_content_block_tag_inside_skip_subtree_does_not_split():
    """A <table>/<div>/<li> nested inside <noscript>/<svg>/<template>
    must not split the enclosing content block: its text is skipped,
    so the boundary is meaningless — splitting scored each half
    separately and could drop text that passes as one block
    (ADVICE r11)."""
    from metadata_enhanced_pretrain_datapipeline_spark.operators.html_extract import (
        html_main_content,
    )

    page = ('<p>First half of one block'
            '<noscript><div>ignored</div></noscript>'
            ' second half</p>')
    # split halves are each < 25 chars collapsed... the first is 24;
    # as ONE block ("First half of one block second half" = 35) it keeps
    out = html_main_content(page)
    assert out == "First half of one block second half"
