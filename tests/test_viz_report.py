"""Visualization report: interactive HTML export + combined summary figure.

Content-level asserts (not just file-exists): the HTML's embedded JSON is
parsed back and checked against the inputs; the summary PNG is decoded and
checked for actual drawn content.
"""

import json
import re

import matplotlib.pyplot as plt
import numpy as np
import pytest


@pytest.fixture()
def report_inputs():
    rng = np.random.default_rng(0)
    n = 300
    targets = np.tanh(rng.standard_normal((n, 3)))
    preds = np.clip(targets + 0.2 * rng.standard_normal((n, 3)), -1, 1)
    unc = 0.1 + 0.2 * rng.random((n, 3))
    history = {
        "train_loss": list(np.linspace(3.0, 0.5, 20)),
        "val_ccc": [0.1, 0.3, 0.5, 0.6, float("nan")],
        "learning_rate": [1e-3] * 20,
    }
    return preds, targets, unc, history


class TestInteractiveReport:
    def test_html_embeds_consistent_data(self, tmp_path, report_inputs):
        from tpu_deer.core.metrics import ccc_np
        from tpu_deer.viz.html_report import create_interactive_report

        preds, targets, unc, history = report_inputs
        path = create_interactive_report(
            preds, targets, unc, history,
            str(tmp_path / "interactive_report.html"),
        )
        html = open(path).read()
        assert html.startswith("<!DOCTYPE html>")
        # No external resources — self-contained, works from file://.
        assert "http://" not in html and "https://" not in html
        m = re.search(
            r'<script id="report-data" type="application/json">(.*?)</script>',
            html, re.S,
        )
        assert m, "embedded data block missing"
        data = json.loads(m.group(1))
        assert data["kpi"]["n_samples"] == len(preds)
        assert data["kpi"]["ccc_avg"] == pytest.approx(
            np.mean([ccc_np(targets[:, i], preds[:, i]) for i in range(3)]),
            abs=1e-6,
        )
        assert len(data["points"]["pred"]) == len(preds)  # under max_points cap
        assert data["dims"] == ["valence", "arousal", "dominance"]
        # Non-finite history entries are serialized as null, not NaN
        # (json.loads above would have failed on bare NaN in a strict
        # parser; check explicitly).
        assert data["history"]["val_ccc"][-1] is None
        assert len(data["reliability"]) == 10
        # Interactive layer markers present.
        for needle in ("onpointermove", "tooltip", "data-theme",
                       "prefers-color-scheme"):
            assert needle in html, needle

    def test_subsampling_caps_points(self, tmp_path, report_inputs):
        from tpu_deer.viz.html_report import create_interactive_report

        preds, targets, unc, history = report_inputs
        path = create_interactive_report(
            preds, targets, unc, history,
            str(tmp_path / "r.html"), max_points=50,
        )
        m = re.search(
            r'<script id="report-data" type="application/json">(.*?)</script>',
            open(path).read(), re.S,
        )
        data = json.loads(m.group(1))
        assert len(data["points"]["pred"]) == 50
        assert data["kpi"]["n_samples"] == len(preds)  # KPIs use all samples


class TestSummaryFigure:
    def test_summary_figure_draws_content(self, tmp_path, report_inputs):
        from tpu_deer.viz.report import plot_summary_figure

        preds, targets, unc, history = report_inputs
        path = plot_summary_figure(
            preds, targets, unc, history, str(tmp_path / "summary.png")
        )
        img = plt.imread(path)
        assert img.shape[0] > 400 and img.shape[1] > 800
        # Actual ink on the canvas, not a blank figure.
        assert float(img[..., :3].std()) > 0.05

    def test_comprehensive_report_includes_new_artifacts(
        self, tmp_path, report_inputs
    ):
        from tpu_deer.viz.report import create_comprehensive_report

        preds, targets, unc, history = report_inputs
        paths = create_comprehensive_report(
            preds, targets, unc,
            attention_weights=np.full((len(preds), 3), 1 / 3),
            history=history,
            output_dir=str(tmp_path),
        )
        assert "interactive" in paths and paths["interactive"].endswith(".html")
        assert "summary" in paths
        import os

        for p in paths.values():
            assert os.path.exists(p), p
