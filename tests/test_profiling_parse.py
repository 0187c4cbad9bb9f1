"""parse_trace_categories must not double-count wrapper/container events.

The TPU device pid in a profiler trace carries op-level events ("XLA Ops"
thread) plus whole-execution wrappers: "XLA Modules" thread events named
``jit_<fn>(...)`` and, INSIDE the op track, control-flow container ops
(``while``) that span their entire body. Summing those alongside the body
ops read a 1.18 ms/step sampling chain as 3.5 ms/step in the round-5
rehearsal. This pins the fixed parse on a synthetic trace.
"""

import gzip
import json

from diffusion_model_nemo_tpu.utils.profiling import parse_trace_categories


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return tmp_path


def test_parse_keeps_only_op_track_and_drops_containers(tmp_path):
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 701, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        # module wrapper spanning the whole run: must NOT count
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_chain(123)",
         "ts": 0, "dur": 1000.0},
        # while container inside the op track: must NOT count
        {"ph": "X", "pid": 3, "tid": 3, "name": "while", "ts": 0, "dur": 990.0},
        # real body ops
        {"ph": "X", "pid": 3, "tid": 3, "name": "convolution.7", "ts": 1,
         "dur": 600.0},
        {"ph": "X", "pid": 3, "tid": 3, "name": "tanh_add_fusion.2", "ts": 601,
         "dur": 380.0},
        # host-side event: must NOT count
        {"ph": "X", "pid": 701, "tid": 1, "name": "convolution.7", "ts": 0,
         "dur": 5000.0},
    ]
    total, by_cat, by_name = parse_trace_categories(_write_trace(tmp_path, events))
    assert abs(total - 0.98) < 1e-9  # 600 + 380 us -> ms
    assert set(by_name) == {"convolution.7", "tanh_add_fusion.2"}
    assert abs(by_cat["conv"] - 0.6) < 1e-9
    assert abs(by_cat["fusion"] - 0.38) < 1e-9
    assert "other" not in by_cat


def test_parse_fallback_without_thread_names(tmp_path):
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_chain(123)",
         "ts": 0, "dur": 1000.0},
        {"ph": "X", "pid": 3, "tid": 3, "name": "while.3", "ts": 0, "dur": 990.0},
        {"ph": "X", "pid": 3, "tid": 3, "name": "reduce_fusion", "ts": 0,
         "dur": 990.0},
    ]
    total, by_cat, _ = parse_trace_categories(_write_trace(tmp_path, events))
    assert abs(total - 0.99) < 1e-9  # only the real op survives
    assert set(by_cat) == {"reduce"}
