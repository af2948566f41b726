"""Self-contained Moebius HTML renderer (linkgraph/viz.py:moebius_html) —
the offline stand-in for the reference's D3 notebook UI
(mercury/graph/viz/moebius.py:226-442)."""

import json
import re

import pytest

from linkgraph import LinkGraph, moebius_html
from linkgraph.viz import moebius_json


@pytest.fixture(scope="module")
def small_graph(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "e")],
        ["src", "dst"],
    )
    return LinkGraph(e, keys={"directed": False})


def test_html_embeds_exact_payload(small_graph):
    html = moebius_html(small_graph, "c", depth=1)
    m = re.search(
        r'<script id="payload" type="application/json">(.*?)</script>',
        html,
        re.S,
    )
    assert m, "payload script block missing"
    embedded = json.loads(m.group(1).replace("<\\/", "</"))
    expected = json.loads(moebius_json(small_graph, "c", depth=1))
    assert embedded == expected
    assert embedded["nodes"]  # non-trivial ego


def test_html_is_offline_and_wellformed(small_graph):
    html = moebius_html(small_graph, "c")
    assert html.startswith("<!DOCTYPE html>")
    # no external fetches of any kind — the whole point vs the reference UI
    assert 'src="http' not in html and "https://" not in html
    assert html.count("<script") == html.count("</script>") == 2
    # the brace-unescape step must leave no doubled braces in the JS
    assert "{{" not in html and "}}" not in html


def test_script_close_injection_escaped(spark):
    e = spark.createDataFrame([("</script><b>x", "y")], ["src", "dst"])
    html = moebius_html(LinkGraph(e), "y")
    # the hostile id must not terminate the payload script block early
    assert html.count("</script>") == 2
    assert "<\\/script><b>x" in html


def test_writes_file(small_graph, tmp_path):
    out = tmp_path / "view.html"
    returned = moebius_html(small_graph, "a", path=str(out))
    assert out.read_text(encoding="utf-8") == returned


def test_layout_script_executes_headless(small_graph, tmp_path):
    """Run the embedded layout JS under node (DOM stubbed) — every node must
    land at finite in-bounds coordinates. Skipped where node is absent."""
    import shutil
    import subprocess

    node = shutil.which("node")
    if node is None:
        pytest.skip("node not available")
    out = tmp_path / "view.html"
    moebius_html(small_graph, "c", depth=2, path=str(out))
    proc = subprocess.run(
        [node, "tests/assets/moebius_headless.js", str(out)],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 0, proc.stderr
    assert "HEADLESS OK" in proc.stdout


def test_title_html_escaped_and_injection_proof(small_graph):
    html = moebius_html(small_graph, "c", title='<b>&"x ${payload}')
    assert "&lt;b&gt;&amp;&quot;x" in html
    # single-pass Template substitution: a '${payload}' in the title must
    # NOT become a second payload insertion point — it survives as literal
    # title text, and the template's own markers are fully consumed
    assert html.count('<script id="payload"') == 1
    assert "${title}" not in html
    assert "<title>&lt;b&gt;" in html


def test_drag_measures_against_svg_box(small_graph):
    html = moebius_html(small_graph, "c")
    # offsetX/Y are target-relative (the circle), not svg-relative — the
    # hit-test must use clientX/Y against the svg bounding box
    assert "getBoundingClientRect" in html
    assert "ev.offsetX" not in html and "ev.offsetY" not in html
