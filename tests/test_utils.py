"""Tests for utils (logging, profiling) and parallel.distributed helpers."""

import json
import time

from multi_spatialmllm_tpu.parallel.distributed import (
    global_batch_slice,
    host_shard,
)
from multi_spatialmllm_tpu.utils.logging import StageLogger
from multi_spatialmllm_tpu.utils.profiling import Timings, device_trace


class TestStageLogger:
    def test_events_and_counters(self, tmp_path):
        sink = str(tmp_path / "events.jsonl")
        log = StageLogger("teststage", sink, echo=False)
        log.event("started", scenes=3)
        log.count("samples", 5)
        log.count("samples", 2)
        log.count("skipped")
        summary = log.summary()
        assert summary["counters"] == {"samples": 7, "skipped": 1}
        events = [json.loads(l) for l in open(sink)]
        assert events[0]["kind"] == "started" and events[0]["scenes"] == 3
        assert events[-1]["kind"] == "summary"


class TestTimings:
    def test_nested_sections(self):
        t = Timings()
        with t.section("outer"):
            time.sleep(0.01)
            with t.section("inner"):
                time.sleep(0.01)
        d = t.as_dict()
        assert set(d) == {"outer", "outer/inner"}
        assert d["outer"] >= d["outer/inner"] > 0
        assert "outer/inner" in t.report()

    def test_device_trace_noop(self):
        with device_trace(None):
            pass  # no-op path


class TestHostSharding:
    def test_host_shard_partition(self):
        items = list(range(10))
        shards = [host_shard(items, process_index=i, process_count=3)
                  for i in range(3)]
        assert sorted(sum(shards, [])) == items
        assert all(abs(len(a) - len(b)) <= 1
                   for a in shards for b in shards)

    def test_global_batch_slice(self):
        starts = [global_batch_slice(32, i, 4) for i in range(4)]
        assert starts == [(0, 8), (8, 8), (16, 8), (24, 8)]
