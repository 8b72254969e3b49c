"""jobs/rollup_job.py end-to-end: startup crash recovery + resume.

Runs the job's ``main()`` in-process against the shared test session
(``SparkSession.stop`` is a no-op'd for the call — the job would
otherwise tear down the suite's session).
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest


@pytest.fixture()
def job_main(spark, monkeypatch):
    """rollup_job.main with SparkSession.stop neutralized."""
    from pyspark.sql import SparkSession

    import jobs.rollup_job as rj

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    return rj.main


def _run(job_main, capsys, out: str, job_id: str) -> dict:
    rc = job_main(["--n-docs", "50", "--output", out, "--job-id", job_id])
    assert rc == 0
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


def test_rollup_job_recovers_crashed_upsert(job_main, tmp_path, capsys):
    """A tier left mid-upsert (manifest present, period swapped out to
    its backup) is rolled back by the job's startup recovery sweep —
    no manual recover_tier call — and the resumed job then skips its
    completed steps."""
    out = str(tmp_path / "out")
    first = _run(job_main, capsys, out, "j1")
    assert first["steps_executed"]["tier_tables"] is True
    assert first["tiers_recovered"] == {}      # fresh output: no tiers yet

    # simulate a kill mid-publish: live period renamed away to its
    # backup, manifest still present (= uncommitted), staging debris
    tier = Path(out) / "tiers" / "tier=day"
    victim = sorted(p.name.split("=", 1)[1]
                    for p in tier.glob("period=*"))[0]
    live = tier / f"period={victim}"
    backup = tier / f".upsert.period={victim}.old"
    live.rename(backup)
    (tier / ".upsert_stage").mkdir()
    (tier / ".upsert_manifest.json").write_text(
        json.dumps({"periods": {victim: True}}))
    assert not live.exists()

    second = _run(job_main, capsys, out, "j1")
    assert second["tiers_recovered"] == {"day": "rolled_back",
                                         "week": "clean",
                                         "month": "clean"}
    # rollback restored the exact pre-crash layout, debris swept
    assert live.exists()
    assert not backup.exists()
    assert not (tier / ".upsert_manifest.json").exists()
    assert not (tier / ".upsert_stage").exists()
    # and the resume contract still holds: completed steps skipped
    assert all(v is False for v in second["steps_executed"].values())
    assert second["mask_counts"] == first["mask_counts"]
