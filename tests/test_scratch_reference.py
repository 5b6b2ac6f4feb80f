"""Execute the reference's offline analysis script BYTE-UNCHANGED.

``/root/reference/model/scratch.py:11-77`` is the reference's Python entry
point: it imports ``pypendulum`` (built nanobind module), runs one 30-
iteration MPC solve with a hard terminal angle equality
(``th_final_cost_weight = -1``), prints the solver summary and draws a
6-panel matplotlib figure. The drop-in claim of ``cartpole_tpu.pypendulum``
is that such scripts run unchanged — this test proves it by copying the
file verbatim and executing it against the shim.

Shimming is exactly what a reference user would do: import the alias module
first (which installs ``sys.modules['pypendulum']``) and use a headless
matplotlib backend. The script's own ``sys.path.insert(0, build/wrapper)``
is harmless — the import resolves from ``sys.modules`` before any path
search.
"""

import runpy
import shutil
import sys
from pathlib import Path

import pytest

REFERENCE_SCRIPT = Path("/root/reference/model/scratch.py")


@pytest.mark.skipif(not REFERENCE_SCRIPT.exists(),
                    reason="reference checkout not present")
def test_reference_scratch_runs_byte_unchanged(tmp_path, capsys, monkeypatch):
    from conftest import require_or_skip

    matplotlib = require_or_skip("matplotlib")
    matplotlib.use("Agg")  # plt.show() becomes a no-op
    import matplotlib.pyplot as plt

    import cartpole_tpu.pypendulum  # noqa: F401  (installs the alias)

    assert sys.modules["pypendulum"] is sys.modules["cartpole_tpu.pypendulum"]

    # Copy byte-for-byte into a fake repo layout so the script's
    # REPO_ROOT / "build" / "wrapper" path computation works on any dir.
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    copy = model_dir / "scratch.py"
    shutil.copyfile(REFERENCE_SCRIPT, copy)
    assert copy.read_bytes() == REFERENCE_SCRIPT.read_bytes()

    plt.close("all")
    n_figs_before = len(plt.get_fignums())
    try:
        runpy.run_path(str(copy), run_name="__main__")
        out = capsys.readouterr().out
        # The script prints outputs.solver_summary() — our summary carries
        # the reference's field vocabulary (wrapper.cc:82-83 ToString()).
        assert "termination" in out.lower() or "iteration" in out.lower(), (
            f"solver summary missing from script output: {out[:200]!r}")
        # All six panels were drawn (3x2 subplot grid reached plt.show()).
        figs = plt.get_fignums()
        assert len(figs) == n_figs_before + 1
        fig = plt.figure(figs[-1])
        assert len(fig.axes) == 6
        # Every panel actually plotted a line (predicted states / u / du).
        for ax in fig.axes:
            assert len(ax.lines) == 1
        (du_line,) = fig.axes[5].lines
        assert du_line.get_xdata().shape[0] >= 2
    finally:
        plt.close("all")
