"""Training liveness: heartbeat files + stall detection (train/watchdog.py).

The detectability half of the failure-detection/elastic-recovery subsystem
(SURVEY §5): recovery is the resumable-checkpoint story, already covered by
test_checkpoint_debug; these pin that failures become VISIBLE.
"""

import json
import os
import time

from vits_tpu.train.watchdog import Watchdog, read_heartbeats


def test_heartbeat_file_written_atomically(tmp_path):
    run = str(tmp_path)
    with Watchdog(run, stall_seconds=60, process_index=3) as wd:
        wd.beat(17)
        hb = read_heartbeats(run)
    assert 3 in hb and hb[3]["step"] == 17
    assert not os.path.exists(os.path.join(run, "heartbeat-3.json.tmp"))


def test_stall_detected_and_marker_written(tmp_path):
    run = str(tmp_path)
    fired = []
    wd = Watchdog(run, stall_seconds=0.3, on_stall=fired.append,
                  log=lambda *a: None)
    try:
        wd.beat(1)
        deadline = time.monotonic() + 5
        while not wd.stalled and time.monotonic() < deadline:
            time.sleep(0.05)
        assert wd.stalled
        assert fired and fired[0] >= 0.3
        assert os.path.exists(os.path.join(run, "STALLED"))
        # a new beat clears the stall state
        wd.beat(2)
        assert not wd.stalled
    finally:
        wd.stop()


def test_read_heartbeats_multi_process(tmp_path):
    run = str(tmp_path)
    for proc in (0, 1, 2):
        with open(os.path.join(run, f"heartbeat-{proc}.json"), "w") as f:
            json.dump({"process": proc, "step": 10 * proc, "time": 0.0,
                       "host": "h"}, f)
    # a corrupt file must not break the scan
    with open(os.path.join(run, "heartbeat-9.json"), "w") as f:
        f.write("{not json")
    hb = read_heartbeats(run)
    assert set(hb) == {0, 1, 2} and hb[2]["step"] == 20


# Integration (the real train() loop beats the watchdog) is asserted in
# test_data_loop.py::test_train_loop_smoke, which already drives train().
