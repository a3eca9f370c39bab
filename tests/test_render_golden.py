"""Byte-exact golden test of the descriptor text rendering
(the appended -log.txt format contract, reference scripts/lib/desc.py:42-79).
"""

from mpnn_tpu.utils.desc import render_net_desc, render_layer_desc, \
    render_stats


DESC = {
    "type": "ActorNet",
    "stats_tr": {"acc": 0.875, "moc": 1.25e7},
    "stats_ts": {"acc": 0.75, "moc": 1.5e7},
    "root": {
        "name": "ToPyramid", "stats_tr": {}, "stats_ts": {},
        "sinks": [{
            "name": "ReConvMax",
            "stats_tr": {"x_rte": 1.5}, "stats_ts": {"x_rte": 2.0},
            "sinks": [
                {"name": "LogReg",
                 "stats_tr": {"p_cor": 0.5, "p_inc": 0.25,
                              "p_cor_by_cls": [0.1, 0.4]},
                 "stats_ts": {"p_cor": 0.4, "p_inc": 0.35},
                 "sinks": []},
                {"name": "ReConvMax",
                 "stats_tr": {"x_rte": 0.5}, "stats_ts": {"x_rte": 0.25},
                 "sinks": [
                     {"name": "LogReg",
                      "stats_tr": {"p_cor": 0.125},
                      "stats_ts": {"p_cor": 0.1},
                      "sinks": []}]},
            ],
        }],
    },
}


def test_render_stats_sorted_and_filters_vectors():
    # Sorted keys, %.3g formatting, vector stats omitted (desc.py:44-49).
    assert render_stats(DESC["root"]["sinks"][0]["sinks"][0]["stats_tr"]) \
        == "(p_cor=0.5; p_inc=0.25)"
    assert render_stats({}) == ""


def test_render_layer_desc_tree_golden():
    text = render_layer_desc(DESC["root"], "stats_tr")
    golden = (
        "ToPyramid \n"
        "↳ ReConvMax (x_rte=1.5)\n"
        "  ↳ LogReg (p_cor=0.5; p_inc=0.25)\n"
        "  ↳ ReConvMax (x_rte=0.5)\n"
        "    ↳ LogReg (p_cor=0.125)")
    assert text == golden


def test_sibling_continuation_bars():
    """Non-last siblings continue with '| ' prefixes (desc.py:53-55)."""
    desc = {"name": "Root", "stats_tr": {}, "sinks": [
        {"name": "A", "stats_tr": {}, "sinks": [
            {"name": "A1", "stats_tr": {}, "sinks": []}]},
        {"name": "B", "stats_tr": {}, "sinks": []},
    ]}
    text = render_layer_desc(desc, "stats_tr")
    golden = (
        "Root \n"
        "↳ A \n"
        "| ↳ A1 \n"
        "↳ B ")
    assert text == golden


def test_render_net_desc_golden():
    text = render_net_desc(DESC, "nets/test/0000.npy — Epoch 2500")
    assert text.splitlines()[0] == "┌" + "─" * 59
    assert "│ nets/test/0000.npy — Epoch 2500" in text
    assert "│   [ActorNet] (acc=0.875; moc=1.25e+07)" in text
    assert "│   [ActorNet] (acc=0.75; moc=1.5e+07)" in text
    # Tree lines are indented under the '│     ' gutter.
    assert "│     ↳ ReConvMax (x_rte=1.5)" in text
    assert text.endswith("│")
