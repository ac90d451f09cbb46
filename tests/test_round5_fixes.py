"""Regression tests for the round-4 judge's advisory findings (ADVICE.md):

- dedup_cluster restores the session-GLOBAL checkpoint dir on every exit
  path (including exceptions), and never leaves it pointing at the
  call's private cc-<id> namespace;
- the Iceberg fence-retry monotonicity re-check and class-name exception
  classification live in tests/test_iceberg_backend.py (OCC twins);
- run_sources CLI --source validation lives in tests/test_spec.py.
"""

import pytest

from foundry_es_spark.queries import dedup

SF = "/root/testdata/sf0.001"


def _current_ckpt(spark):
    opt = spark.sparkContext._jsc.sc().getCheckpointDir()
    return opt.get() if opt.isDefined() else None


def test_dedup_cluster_restores_checkpoint_dir(spark, tmp_path):
    """ADVICE r4: after a checkpointed clustering run the global
    checkpoint dir must NOT point at the call's cc-<id> subdir — with no
    prior dir it restores to the caller's PARENT dir."""
    ckpt = str(tmp_path / "ck")
    prior = _current_ckpt(spark)
    dedup.dedup_cluster(spark, SF, checkpoint_dir=ckpt).collect()
    after = _current_ckpt(spark)
    # setCheckpointDir always appends a fresh UUID subdir, so "restored"
    # means: under the prior path (or the caller's parent dir when no
    # prior existed) and OUTSIDE this call's cc-<id> namespace
    assert after is not None and "/cc-" not in after
    if prior is not None:
        assert after.startswith(prior)
    else:
        assert "/ck/" in after or after.rstrip("/").endswith("/ck")


def test_dedup_cluster_restores_checkpoint_dir_on_error(spark, tmp_path):
    """The restore must run on the EXCEPTION path too: a failure
    mid-clustering must not silently redirect later checkpoint consumers
    into this call's namespace."""
    ckpt = str(tmp_path / "ck2")
    before = _current_ckpt(spark)
    with pytest.raises(Exception):
        # nonexistent sf dir: the body's scan setup raises after the
        # checkpoint dir was already switched
        dedup.dedup_cluster(spark, str(tmp_path / "no_such_sf"), checkpoint_dir=ckpt)
    after = _current_ckpt(spark)
    assert after is not None and "/cc-" not in after
    if before is not None:
        assert after.startswith(before)
    else:
        assert "/ck2/" in after or after.rstrip("/").endswith("/ck2")
