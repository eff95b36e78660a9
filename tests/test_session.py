"""dvx.session.warm_start: the one-time engine warm-up lever.

The warm-up exists so the FIRST real micro-batch of a stream does not
pay Python-worker fork + codegen cold-start inside the hot path
(measured 15-20 s of batch-1 wall at sf0.1/local[32]). These tests pin
its contract: once per session, env-disable, no files left behind.
"""

from __future__ import annotations

import glob
import os

from dvx import session as dvx_session
from dvx.session import _scratch_dir, warm_start


def test_warm_start_runs_once_and_is_env_disableable(spark, monkeypatch):
    app_id = spark.sparkContext.applicationId

    # disabled: returns before marking the session as warmed
    monkeypatch.setattr(dvx_session, "_WARMED", set())
    monkeypatch.setenv("DVX_WARM_START", "0")
    warm_start(spark)
    assert dvx_session._WARMED == set()

    # enabled: runs and marks; a second call is a no-op (guard holds)
    monkeypatch.delenv("DVX_WARM_START")
    warm_start(spark)
    assert app_id in dvx_session._WARMED
    warm_start(spark)
    assert len(dvx_session._WARMED) == 1

    # the synthetic warm job cleans up its scratch parquet
    assert glob.glob(os.path.join(_scratch_dir(), "dvx_warm_*")) == []


def test_create_all_tables_triggers_warm_start(spark, tmp_path, monkeypatch):
    from dvx.schema import Vault

    monkeypatch.setattr(dvx_session, "_WARMED", set())
    vault = Vault(spark, str(tmp_path / "wh"), num_buckets=4)
    vault.create_all_tables()
    assert spark.sparkContext.applicationId in dvx_session._WARMED
