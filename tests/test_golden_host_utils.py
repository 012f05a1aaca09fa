"""Golden cross-checks: the rebuild's host utilities vs the REFERENCE's own
TF-free numpy scripts, run as subprocesses on shared synthetic confusion CSVs
(VERDICT r2 item 7 — needs no licensed data).

Reference scripts: `/root/reference/utilities/stat_extractor.py:94-167`,
`/root/reference/utilities/latex_table_from_conf_set.py:22-284`.  The only
accommodation is patching the long-removed ``numpy.int``/``numpy.float``
aliases the 2020-era reference uses.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

REF_UTILITIES = "/root/reference/utilities"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_UTILITIES), reason="reference checkout not present")

# runs the reference script inside its own directory with the numpy alias shim
_REF_BOOTSTRAP = (
    "import numpy, sys;"
    "numpy.int = getattr(numpy, 'int', int); numpy.float = getattr(numpy, 'float', float);"
    "sys.path.insert(0, {utildir!r}); sys.argv = {argv!r};"
    "import {module}; {module}.main()"
)


def run_reference(module: str, argv_rest):
    code = _REF_BOOTSTRAP.format(utildir=REF_UTILITIES,
                                 argv=[module] + list(argv_rest), module=module)
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


def make_conf_dirs(tmp_path, n_methods=2, n_runs=3, classes=5, seed=7):
    """Confusion CSVs with FIXED per-class row sums across runs — like real
    experiments, where every run evaluates the same test split.  (The
    reference's ``sample_count`` comes from whichever file globs first, so
    realistic inputs make it order-invariant.)"""
    rng = np.random.default_rng(seed)
    dirs = []
    for m in range(n_methods):
        d = tmp_path / f"method{m}"
        d.mkdir()
        row_sums = rng.integers(80, 250, size=classes)
        for r in range(n_runs):
            conf = np.zeros((classes, classes), dtype=int)
            for c in range(classes):
                p = np.full(classes, 0.3 / (classes - 1))
                p[c] = 0.7
                conf[c] = rng.multinomial(row_sums[c], p)
            np.savetxt(d / f"run_{r}.csv", conf, fmt="%d", delimiter=",")
        dirs.append(str(d))
    return dirs


class TestStatExtractorGolden:
    def test_stdout_identical_to_reference(self, tmp_path):
        (d,) = make_conf_dirs(tmp_path, n_methods=1)
        ref_out = run_reference("stat_extractor", [d])
        ours = subprocess.run(
            [sys.executable, "-m", "hypelcnn_tpu.utils.stat_extractor", d],
            capture_output=True, text=True, timeout=120,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert ours.returncode == 0, ours.stderr
        # the reference globs files in filesystem order, the rebuild sorts:
        # per-run lines may be permuted, everything after the aggregate
        # header is order-invariant and must match byte-for-byte
        marker = "#Metrics statistics:"
        ref_runs, _, ref_agg = ref_out.partition(marker)
        our_runs, _, our_agg = ours.stdout.partition(marker)
        assert sorted(our_runs.splitlines()) == sorted(ref_runs.splitlines())
        assert our_agg == ref_agg

    def test_kappa_and_fisher_z_math(self, tmp_path):
        # direct numeric check of the two nontrivial kernels on shared input
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ref_stat_extractor", os.path.join(REF_UTILITIES, "stat_extractor.py"))
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        from hypelcnn_tpu.utils import stat_extractor as ours
        rng = np.random.default_rng(0)
        conf = rng.integers(0, 40, size=(7, 7)) + np.diag(rng.integers(30, 90, size=7))
        assert ours.calc_kappa(conf) == pytest.approx(ref.calc_kappa(conf), abs=1e-12)
        kappas = rng.uniform(-0.5, 0.999, size=6)
        weights = rng.uniform(0.5, 2.0, size=6)
        assert ours.calc_mean_quadratic_weighted_kappa(kappas, weights) == \
            pytest.approx(ref.calc_mean_quadratic_weighted_kappa(kappas, weights), abs=1e-12)


CELL_RE = re.compile(
    r"(?P<bold>\\textbf\{)?(?P<mean>-?\d+\.\d{2})\}?\$?\\pm\$?\{?(?:\\textbf\{)?(?P<std>-?\d+\.\d{2})")


def parse_cells(latex: str):
    """(mean, std, bold) triples in document order, format-agnostic."""
    return [(m.group("mean"), m.group("std"), m.group("bold") is not None)
            for m in CELL_RE.finditer(latex)]


class TestLatexTableGolden:
    def test_cell_values_and_bolding_match_reference(self, tmp_path):
        dirs = make_conf_dirs(tmp_path, n_methods=3, classes=4)
        cfg = tmp_path / "cfg"
        cfg.mkdir()
        (cfg / "method_name_list.csv").write_text("m0,m1,m2\n")
        (cfg / "class_dist_info.csv").write_text(
            "".join(f"Class {i} (10/20)\n" for i in range(4)))
        (cfg / "table_info.csv").write_text("Results,results\n")
        ref_out = run_reference("latex_table_from_conf_set", [str(cfg)] + dirs)

        from hypelcnn_tpu.utils.latex_table import build_table
        ours_out = build_table({f"m{i}": d for i, d in enumerate(dirs)})

        ref_cells = parse_cells(ref_out)
        our_cells = parse_cells(ours_out)
        # reference column-wise layout: class rows then OA/AA/Kappa rows,
        # methods across — the same cell order as the rebuild's table
        assert len(ref_cells) == (4 + 3) * 3
        assert our_cells == ref_cells
