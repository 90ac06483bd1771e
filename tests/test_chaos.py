"""Chaos/fault evidence for the 100-TB claim (VERDICT r4 #4): a Ray
worker process SIGKILLed mid-flagship-run must not change the result —
Ray lineage re-executes the lost tasks and the synthetic source is a
pure function of (seed, row_index), so replay is byte-identical.

Reference analogue: the ack-tracker's replay-on-failure contract
(/root/reference/lib/ack-tracker/consecutive_ack_tracker.c) — a crashed
worker's in-flight window is re-read from the bookmark, not lost."""
import os
import signal

import pandas as pd
import pytest

from axosyslog_ray.pipelines.flagship import flagship_routed
from axosyslog_ray.synth import pages_dataset

N_ROWS = 20_000
BLOCKS = 16


def _sink_counts(routed) -> pd.Series:
    df = routed.groupby("route").count().to_pandas()
    cnt = [c for c in df.columns if c != "route"][0]
    return df.set_index("route")[cnt].sort_index()


@pytest.mark.usefixtures("ray_session")
def test_worker_kill_mid_flagship_replays_to_identical_counts(tmp_path):
    marker = str(tmp_path / "chaos.marker")

    def chaos(batch):
        # exactly one task across the job SIGKILLs its own worker
        # process MID-TASK (the marker is created first, so the
        # re-executed task passes through); O_EXCL makes the
        # kill-exactly-once decision atomic across workers
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            os.kill(os.getpid(), signal.SIGKILL)
        except FileExistsError:
            pass
        return batch

    routed = flagship_routed(pages_dataset(N_ROWS, blocks=BLOCKS),
                             batch_size=2048)
    chaotic = routed.map_batches(chaos, batch_format="pyarrow")
    got = _sink_counts(chaotic)

    assert os.path.exists(marker), "chaos stage never ran"
    clean = _sink_counts(flagship_routed(
        pages_dataset(N_ROWS, blocks=BLOCKS), batch_size=2048))
    pd.testing.assert_series_equal(got, clean)
    assert int(got.sum()) == N_ROWS


@pytest.mark.usefixtures("ray_session")
def test_worker_kill_during_shuffle_replays_to_identical_counts(tmp_path):
    """Same chaos, harder phase: the kill fires inside the map feeding a
    groupby (all-to-all) exchange — lineage must replay map outputs the
    shuffle already consumed."""
    from axosyslog_ray.aggregate import pre_aggregated_count

    marker = str(tmp_path / "chaos_shuffle.marker")

    def chaos(batch):
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            os.kill(os.getpid(), signal.SIGKILL)
        except FileExistsError:
            pass
        return batch

    def counts(with_chaos: bool) -> pd.Series:
        routed = flagship_routed(pages_dataset(N_ROWS, blocks=BLOCKS),
                                 batch_size=2048)
        if with_chaos:
            routed = routed.map_batches(chaos, batch_format="pyarrow")
        out = pre_aggregated_count(routed, ["route"], alias="n") \
            .to_pandas()
        return out.set_index("route")["n"].sort_index()

    got = counts(True)
    assert os.path.exists(marker), "chaos stage never ran"
    clean = counts(False)
    pd.testing.assert_series_equal(got, clean)
    assert int(got.sum()) == N_ROWS
