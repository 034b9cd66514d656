"""North-rule deployment surface: the engine runs under real
``spark-submit --py-files`` with NO repo checkout on the "cluster" — the
package resolves from the zip alone, on the driver and inside the
pandas-UDF workers (redo-SQL parse + HTML extraction run there).
Reference lifecycle analog: SourceTask start/poll (SourceTask.kt:20-150)
as a submitted batch application."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit_bin() -> str:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    found = shutil.which("spark-submit")
    assert found, "spark-submit not found"
    return found


def test_replay_via_spark_submit_pyfiles(spark, tmpdir_path):
    from logminer_kafka_connect_spark.sources.generator import (
        SCN0,
        CdcGenerator,
        GeneratorConfig,
    )

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_pyfiles import build

    gen = CdcGenerator(GeneratorConfig(seed=7, n_txns=60, n_urls=40, n_snapshot=15))
    events_path = os.path.join(tmpdir_path, "events")
    snap_path = os.path.join(tmpdir_path, "snapshot")
    gen.events_df(spark).write.parquet(events_path)
    gen.snapshot_df(spark).write.parquet(snap_path)

    # the "cluster" side: only the zip, the app file, and the data
    zip_path = build(os.path.join(tmpdir_path, "lmkc.zip"))
    with zipfile.ZipFile(zip_path) as z:
        names = z.namelist()
    assert "logminer_kafka_connect_spark/engine.py" in names
    assert not any(n.endswith(".pyc") or "/tests/" in n for n in names)
    app = os.path.join(tmpdir_path, "submit_job.py")
    shutil.copy(os.path.join(REPO, "scripts", "submit_job.py"), app)
    workdir = os.path.join(tmpdir_path, "work")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # prove imports come from --py-files only
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            _spark_submit_bin(),
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            app,
            "--events", events_path,
            "--workdir", workdir,
            "--snapshot", snap_path,
            "--snapshot-scn", str(SCN0 - 1),
            "--batches", "2",
            "--tracking",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=tmpdir_path,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert out["events_applied"] > 0
    assert out["parse_errors"] == 0
    assert out["applied_batches"] == 2
    assert out["table_version"] >= 2

    # the submitted run's final table state must equal an in-process
    # replay of the same log (same engine, same input, fresh workdir)
    from logminer_kafka_connect_spark.engine import CdcEngine

    ref = CdcEngine(spark, os.path.join(tmpdir_path, "ref"), n_buckets=16)
    ref.load_snapshot(spark.read.parquet(snap_path), snapshot_scn=SCN0 - 1)
    ref.replay(spark.read.parquet(events_path), n_batches=2)
    ref_state = {
        (r["url"], r["text"], r["lang"]) for r in ref.state().collect()
    }
    sub = CdcEngine(spark, workdir, n_buckets=16)
    sub_state = {
        (r["url"], r["text"], r["lang"]) for r in sub.state().collect()
    }
    assert sub_state == ref_state
    assert out["table_rows"] == len(ref_state)
