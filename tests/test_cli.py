"""CLI entry points (cli.main) — synth, conflate with resume, tile, verify."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_merge_spark import cli


def _run(capsys, *args) -> dict:
    rc = cli.main(["--master", "local[4]", *args])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0
    return json.loads(out)


def test_cli_synth_conflate_resume_tile_verify(spark, tmp_path, capsys):
    base = str(tmp_path)
    r = _run(capsys, "synth", "--n", "300", "--out", f"{base}/d", "--bytes")
    assert os.path.exists(r["images"])

    r1 = _run(capsys, "conflate", "--images", f"{base}/d/images",
              "--layer", f"{base}/d/layer", "--out", f"{base}/run",
              "--tile-m", "5000")
    assert r1["matched"] + r1["new"] == 300
    assert len(r1["stages_executed"]) == 5 and not r1["stages_skipped"]

    r2 = _run(capsys, "conflate", "--images", f"{base}/d/images",
              "--layer", f"{base}/d/layer", "--out", f"{base}/run",
              "--tile-m", "5000")
    assert not r2["stages_executed"] and len(r2["stages_skipped"]) == 5

    r3 = _run(capsys, "tile", "--images", f"{base}/d/images",
              "--out", f"{base}/tiles", "--tile-m", "20000")
    assert r3["rows"] == 300

    r4 = _run(capsys, "verify", "--images", f"{base}/d/images")
    assert r4 == {"total": 300, "failed": 0, "ok": True}
