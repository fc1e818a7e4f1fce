"""Dry-run test of scripts/run_released_parity.sh (VERDICT r3 #6): builds a
synthetic tacorl_calvin.zip with the released layout (README.md:98-104
upstream — one run dir per family, each holding config.yaml + *.ckpt) and
asserts the emitted command sequence: one conversion per family, the full
4x4 evaluation preset matrix, the play_lmp_dir re-pointing for the grafted
families, and the summary collation."""

import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "scripts" / "run_released_parity.sh"

FAMILIES = ("play_lmp", "tacorl", "cql", "ril")
PROTOCOLS = ("easy", "hard", "lh_easy", "lh_seq_easy")
EVAL_NAME = {"play_lmp": "lmp", "tacorl": "tacorl", "cql": "cql", "ril": "ril"}


@pytest.fixture(scope="module")
def dry_run_output(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("parity")
    # released layout: a root folder whose NAME CONTAINS a family substring
    # ("tacorl_calvin") — the regression the exact-dir-match fix guards
    zip_path = tmp / "tacorl_calvin.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for fam in FAMILIES:
            zf.writestr(f"tacorl_calvin/{fam}/config.yaml", f"module: {fam}\n")
            zf.writestr(f"tacorl_calvin/{fam}/epoch=5.ckpt", b"\x00ckpt")
    data_dir = tmp / "calvin_data"
    data_dir.mkdir()
    out_dir = tmp / "out"
    proc = subprocess.run(
        ["bash", str(SCRIPT), str(zip_path), str(data_dir), str(out_dir)],
        env={"DRY_RUN": "1", "PATH": "/usr/bin:/bin:/usr/local/bin"},
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    return proc.stdout, out_dir


def test_conversion_commands(dry_run_output):
    stdout, out_dir = dry_run_output
    dry_lines = [ln for ln in stdout.splitlines() if ln.startswith("+ ")]
    for fam in FAMILIES:
        conv = [
            ln
            for ln in dry_lines
            if "convert_checkpoint.py" in ln and f"--kind {fam} " in ln
        ]
        assert len(conv) == 1, (fam, dry_lines)
        # the checkpoint must come from THAT family's run dir, not the zip
        # root or a sibling family
        assert f"tacorl_calvin/{fam}/epoch=5.ckpt" in conv[0], conv[0]
        assert f"--out {out_dir}/converted/{fam}" in conv[0]


def test_eval_matrix_and_grafted_override(dry_run_output):
    stdout, out_dir = dry_run_output
    dry_lines = [ln for ln in stdout.splitlines() if ln.startswith("+ ")]
    evals = [ln for ln in dry_lines if "evaluate.py" in ln]
    assert len(evals) == len(FAMILIES) * len(PROTOCOLS), evals
    for fam in FAMILIES:
        for protocol in PROTOCOLS:
            preset = f"{EVAL_NAME[fam]}_{protocol}"
            matching = [
                ln
                for ln in evals
                if f"evaluation={preset} " in ln
                and f"module_path={out_dir}/converted/{fam} " in ln
            ]
            assert len(matching) == 1, (preset, evals)
            needs_lmp = fam in ("tacorl", "ril")
            has_override = (
                f"+overwrite_module_cfg.play_lmp_dir={out_dir}/converted/play_lmp"
                in matching[0]
            )
            assert has_override == needs_lmp, matching[0]


def test_summary_collation_emitted(dry_run_output):
    stdout, _ = dry_run_output
    assert "parity run complete" in stdout
    # the collation step is itself DRY-printed
    assert any(
        ln.startswith("+ python -") for ln in stdout.splitlines()
    ), stdout
