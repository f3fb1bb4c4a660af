"""Driver-parity gate: registry entries must work on a VANILLA SparkSession.

Every other test runs on the repo's tuned session (Arrow on, UTC, AQE —
tests/conftest.py), but the correctness driver hands queries a session with
NONE of those configs.  Two rounds of driver-only failures (r3: DuckDB
HUGEINT typing, r4: Arrow schema inference in the binary-interop import)
passed the whole local suite because nothing ever ran bare.  This gate
subprocess-runs ``tools/verify_local.py --bare`` — a fresh Python process,
so the vanilla session cannot inherit the test JVM's configs — over the
entries whose plans depend on session config the most:

- ``roargraph_binary_interop``   driver-side createDataFrame (the r4 crash)
- ``roargraph_nsg_import``       same Arrow-Table import path, count-less layout
- ``roargraph_stream_insert``    foreachBatch + file-source streaming state
- ``events_sessionize``          timestamp arithmetic (timezone-sensitive)
- ``udf_registry_distances``     pandas-UDF surface (Arrow batch transfer)
- ``stream_tumbling_oracled``    Structured Streaming + windows
- ``dedup_exact``                xxhash64/grouping (AQE/shuffle defaults)
- ``dedup_simhash``              md5->conv->shiftleft signing (ANSI-mode sensitive)
- ``emb_pca_variance``           posexplode moment combine + localCheckpoint
- ``roargraph_stream_maintain``  churn feed (delete splice + insert per batch)

Full-registry bare runs are a round-cadence job (python tools/verify_local.py
--bare), not a per-test cost.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BARE_ENTRIES = [
    "roargraph_binary_interop",
    "roargraph_nsg_import",
    "roargraph_stream_insert",
    "events_sessionize",
    "udf_registry_distances",
    "stream_tumbling_oracled",
    "dedup_exact",
    "dedup_simhash",
    "emb_pca_variance",
    "roargraph_stream_maintain",
]


def test_registry_entries_pass_on_vanilla_session():
    env = dict(os.environ)
    env.pop("PYSPARK_SUBMIT_ARGS", None)
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "verify_local.py"), "--bare"]
        + BARE_ENTRIES,
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    out = proc.stdout + "\n" + proc.stderr
    assert proc.returncode == 0, f"bare-session verify failed:\n{out[-4000:]}"
    # every selected entry must actually have run (a typo'd name silently
    # matching nothing would make this gate vacuous)
    for name in BARE_ENTRIES:
        assert f" {name}:" in proc.stdout, f"entry {name} never ran:\n{out[-2000:]}"
