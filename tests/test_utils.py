"""Small utils coverage: profiler helpers, config value parsing."""

import time

import numpy as np

from deepctr_tpu.config import RunConfig, _parse_value
from deepctr_tpu.utils.prof import ThroughputMeter, scope, trace


def test_throughput_meter():
    m = ThroughputMeter(warmup_steps=2)
    assert np.isnan(m.examples_per_s)
    for _ in range(2):
        m.step(100)
    time.sleep(0.05)
    m.step(100)
    assert m.examples_per_s > 0


def test_trace_noop_and_scope():
    with trace(None):
        with scope("lookup"):
            pass  # no-op path must not require a profiler session


def test_parse_value_edges():
    assert _parse_value("true", False) is True
    assert _parse_value("0", True) is False
    assert _parse_value("7", 1) == 7
    assert _parse_value("0.5", 1.0) == 0.5
    assert _parse_value("64,32", (1,)) == (64, 32)
    assert _parse_value("none", None) is None
    assert _parse_value("3", None) == 3
    assert _parse_value("x.ckpt", None) == "x.ckpt"


def test_override_nested_none_and_strings(tmp_path):
    cfg = RunConfig().apply_overrides(
        ["train.checkpoint_path=/tmp/a.ckpt", "train.pretrain=dae",
         "train.num_devices=4"]
    )
    assert cfg.train.checkpoint_path == "/tmp/a.ckpt"
    assert cfg.train.pretrain == "dae"
    assert cfg.train.num_devices == 4
    cfg2 = cfg.apply_overrides(["train.pretrain=none"])
    assert cfg2.train.pretrain is None
