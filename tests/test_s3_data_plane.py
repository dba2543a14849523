"""Spark DATA plane over S3 — end to end, for real.

The rest of the S3 suite (``test_s3_fileio.py``) proves the METADATA
protocol (conditional-PUT commits, paginated listing, ranged-GET footer
harvest) against in-process moto. This module closes the remaining gap:
Spark itself reading and writing parquet bytes through ``s3a://`` URIs,
which exercises

- the committer path (task/job renames, ``_SUCCESS``) on an object
  store with copy+delete rename semantics;
- ``CommitLogTableStore`` staging data dirs directly at ``s3a://``
  paths while ``S3FileIO`` handles manifests over boto3 against the
  SAME endpoint;
- the ``spark_scheme="s3a"`` branch of distributed manifest scans
  (``writers.py`` ``_entries_frame``): the checkpoint sidecar parquet
  is read by Spark over s3a, not the driver;
- the concurrency-race suite (commit races, vacuum vs in-flight
  sidecar) on the S3 backend.

This sandbox ships pyspark without hadoop-aws jars and has no network
to fetch them, so the s3a scheme is served by a minimal test-only
Hadoop FileSystem (``tests/javasrc/motofs/MotoS3FileSystem.java``,
compiled here with the JDK against pyspark's hadoop-client-api jar)
that speaks real S3 REST — ranged GETs, LIST v2 pagination, CopyObject
renames, dir markers — to the moto server. Production deployments use
the genuine hadoop-aws S3A connector; the engine code under test is
identical either way.

The lifecycle runs in a CHILD process (``_s3_data_plane_child.py``)
because the driver classpath must be set before the JVM starts.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JAVA_SRC = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "javasrc", "motofs", "MotoS3FileSystem.java",
)


def _javac() -> str | None:
    cand = shutil.which("javac")
    if cand:
        return cand
    home = os.environ.get("JAVA_HOME")
    if home and os.path.exists(os.path.join(home, "bin", "javac")):
        return os.path.join(home, "bin", "javac")
    return None


def _hadoop_api_jar() -> str | None:
    import pyspark

    jars = glob.glob(
        os.path.join(os.path.dirname(pyspark.__file__), "jars",
                     "hadoop-client-api-*.jar")
    )
    return jars[0] if jars else None


@pytest.fixture(scope="module")
def motofs_classes(tmp_path_factory):
    javac = _javac()
    jar = _hadoop_api_jar()
    if javac is None or jar is None:
        pytest.skip("JDK or hadoop-client-api jar unavailable")
    out = tmp_path_factory.mktemp("motofs-classes")
    subprocess.run(
        [javac, "-encoding", "UTF-8", "-cp", jar, "-d", str(out), JAVA_SRC],
        check=True,
        capture_output=True,
    )
    return str(out)


@pytest.mark.slow
def test_s3_data_plane_lifecycle(motofs_classes):
    child = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "_s3_data_plane_child.py")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, child, motofs_classes],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
        env=env,
    )
    assert proc.returncode == 0, (
        f"child failed:\n--- stdout ---\n{proc.stdout[-3000:]}"
        f"\n--- stderr ---\n{proc.stderr[-3000:]}"
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip().startswith("{")]
    assert lines, proc.stdout[-2000:]
    checks = json.loads(lines[-1])

    assert checks["raw_roundtrip"] is True
    assert checks["raw_filtered"] is True
    assert checks["append_rows"] == 20
    assert checks["merge_rows"] == 21
    assert checks["merge_upsert"] is True
    assert checks["deleted_rows"] == 18
    assert checks["mor_zero_rewrites"] is True
    assert checks["mor_rows"] == 16
    assert checks["mor_stats"] is True
    assert checks["dv_materialized"] is True
    assert checks["plan_distributed"] is True
    assert checks["plan_pruned"] is True
    assert checks["read_where_match"] is True
    assert checks["compact_match"] is True
    assert checks["v1_rows"] == 10
    assert checks["add_col_default"] is True
    assert checks["merge_into_counts"] is True
    assert checks["merge_into_idempotent"] is True
    assert checks["optimize_ran"] is True
    assert checks["round7_rows"] is True
    assert checks["race_appends_clean"] is True
    assert checks["race_append_rows"] == 5
    assert checks["race_versions"] == 5
    assert "ok" in checks["race_delete_outcomes"]
    assert checks["race_delete_empty"] is True
    assert checks["vacuum_keeps_inflight"] is True
    assert checks["vacuum_gcs_dead"] is True
    assert checks["post_vacuum_match"] is True
