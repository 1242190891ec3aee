"""Live config schema parity (VERDICT r2 item 7).

Covers the shapes of all 7 reference live TOMLs
(/root/reference/test_data/live_balancing/config_*.toml) against the full
parser (warpdemux_tpu/live/config_parser.py), plus the per-balancer
reject_duration behavior: two balancers with different reject_durations must
produce different unblock durations (reference worker.py:196-205).
"""

import numpy as np
import pytest

from warpdemux_tpu.live.balancer import BalancerConfig, BarcodeBalancers
from warpdemux_tpu.live.config_parser import (
    parse_live_config_full,
)
from warpdemux_tpu.live.session import Session, SessionConfig


def _write(tmp_path, body, name="live.toml"):
    p = tmp_path / name
    p.write_text(body)
    return p


BASE = """
[model]
model_name = "WDX12_rna002_v0_4_4"

[flowcell]
flowcell_type = "flongle"

[processing]
nproc_segmentation = 2
nproc_classification = 4

[acquisition]
max_missed_start_offset = 400
max_chunk_size = 12000

[balancing]
pred_conf_threshold = 0.2

[reporting]
save_every_sec = 5
save_path = "results"
"""


# ---- the 7 reference TOML shapes ------------------------------------------

def test_shape_only_none(tmp_path):
    p = _write(tmp_path, BASE + """
[[balancers]]
balance_threshold = 0.05
min_stat = 100
balance_type = "none"
""")
    pc = parse_live_config_full(p)
    assert pc.n_channels == 126  # flongle
    assert pc.session.nproc_segmentation == 2
    assert pc.session.nproc_classification == 4
    assert pc.session.save_every_sec == 5
    assert pc.session.max_chunk_size == 12000
    assert pc.balancers[0].balance_type == "none"
    assert pc.balancers[0].name == "none"


def test_shape_only_reject_all(tmp_path):
    p = _write(tmp_path, BASE + """
[[balancers]]
balance_threshold = 0.05
min_stat = 100
balance_type = "reject_all"
""")
    pc = parse_live_config_full(p)
    assert pc.balancers[0].balance_type == "reject_all"


def test_shape_only_adapter_count(tmp_path):
    # per-barcode key forms: blacklist_barcodeNN / watch_barcodeNN
    p = _write(tmp_path, BASE + """
[[balancers]]
balance_threshold = 0.05
min_stat = 100
balance_type = "adapter_count"

blacklist_barcode08 = true
watch_barcode00 = false
""")
    b = parse_live_config_full(p).balancers[0]
    assert b.barcodes_blacklist == (8,)
    assert b.barcodes_ignorelist == (0,)
    assert b.balance_threshold == 0.05
    assert b.min_stat == 100


def test_shape_only_read_count(tmp_path):
    p = _write(tmp_path, BASE + f"""
[[balancers]]
balance_threshold = 0.4
min_stat = 10
balance_type = "read_count"
pod5_watch_dir = "{tmp_path}"
pod5_check_interval = 0.5
channel_frac = 0.95
""")
    b = parse_live_config_full(p).balancers[0]
    assert b.balance_type == "read_count"
    assert b.pod5_watch_dir == str(tmp_path)
    assert b.pod5_check_interval == 0.5
    assert b.channel_frac == 0.95


def test_shape_only_base_normalization(tmp_path):
    p = _write(tmp_path, BASE + f"""
[[balancers]]
balance_threshold = 0.4
min_stat = 10
balance_type = "base_normalization"
pod5_watch_dir = "{tmp_path}"
channel_frac = 0.9
""")
    b = parse_live_config_full(p).balancers[0]
    assert b.balance_type == "base_normalization"


def test_shape_multiple_adapter_count(tmp_path):
    # three balancers with names, fracs, max_barcodeNN, watch_for_missing
    p = _write(tmp_path, BASE.replace("flongle", "minion") + """
[[balancers]]
balance_threshold = 0.05
min_stat = 100
balance_type = "adapter_count"
name = "adapter_count1"
channel_frac = 0.4
blacklist_barcode08 = true
watch_barcode00 = false

[[balancers]]
balance_threshold = 0.05
min_stat = 30
balance_type = "adapter_count"
name = "adapter_count2"
channel_frac = 0.4
blacklist_barcode03 = true
watch_for_missing = false
max_barcode01 = 40

[[balancers]]
balance_threshold = 0.05
min_stat = 100
balance_type = "none"
channel_frac = 0.1
blacklist_barcode03 = true
watch_for_missing = false
""")
    pc = parse_live_config_full(p)
    assert pc.n_channels == 512  # minion
    b0, b1, b2 = pc.balancers
    assert (b0.name, b1.name, b2.name) == (
        "adapter_count1", "adapter_count2", "none",
    )
    assert b1.max_stats == {1: 40.0}
    assert b1.watch_for_missing is False
    assert b0.watch_for_missing is True
    assert b1.barcodes_blacklist == (3,)

    # channel assignment: 40% + 40% + 10%, leftover 10% folds into the
    # first 'none' balancer (reference MainConfig._create_balancers)
    bb = BarcodeBalancers.from_configs(12, pc.balancers,
                                       n_channels=pc.n_channels)
    counts = np.bincount(
        [bb.channel_map[c] for c in range(1, 513)], minlength=3
    )
    assert counts[0] == int(0.4 * 512)
    assert counts[1] == int(0.4 * 512)
    # none balancer got its 10% plus every leftover channel
    assert counts[2] == 512 - counts[0] - counts[1]
    assert len(bb.balancers) == 3  # no extra balancer created


def test_shape_multiple_with_reject_durations(tmp_path):
    p = _write(tmp_path, BASE + """
[[balancers]]
balance_type = "adapter_count"
name = "adapter_count1"
channel_frac = 0.4
reject_duration = 0.1

[[balancers]]
balance_type = "adapter_count"
name = "adapter_count2"
channel_frac = 0.4
reject_duration = 0.2

[[balancers]]
balance_type = "none"
channel_frac = 0.1
reject_duration = 0.3
""")
    pc = parse_live_config_full(p)
    assert [b.reject_duration for b in pc.balancers] == [0.1, 0.2, 0.3]
    # absent -> None -> session-global applies
    p2 = _write(tmp_path, BASE + """
[[balancers]]
balance_type = "adapter_count"
""", name="live2.toml")
    assert parse_live_config_full(p2).balancers[0].reject_duration is None


# ---- validation errors ------------------------------------------------------

def test_flowcell_required(tmp_path):
    p = _write(tmp_path, """
[model]
model_name = "WDX4_rna004_v1_0"
""")
    with pytest.raises(ValueError, match="[Ff]lowcell"):
        parse_live_config_full(p)


def test_unknown_key_rejected(tmp_path):
    p = _write(tmp_path, BASE + """
[[balancers]]
balance_type = "none"
not_a_real_knob = 3
""")
    with pytest.raises(ValueError, match="Unknown key"):
        parse_live_config_full(p)


def test_unknown_section_key_rejected(tmp_path):
    p = _write(
        tmp_path, BASE.replace("max_chunk_size = 12000",
                               "max_chunk_size = 12000\nbogus = 1")
    )
    with pytest.raises(ValueError, match="Unknown key"):
        parse_live_config_full(p)


def test_min_gt_max_chunk_rejected(tmp_path):
    p = _write(
        tmp_path,
        BASE.replace("max_chunk_size = 12000",
                     "max_chunk_size = 1000\nmin_chunk_size = 2000"),
    )
    with pytest.raises(ValueError, match="min_chunk_size"):
        parse_live_config_full(p)


def test_channel_frac_xor_num(tmp_path):
    p = _write(tmp_path, BASE + """
[[balancers]]
balance_type = "none"
channel_frac = 0.5
channel_num = 10
""")
    with pytest.raises(ValueError, match="channel_frac and channel_num"):
        parse_live_config_full(p)


def test_blacklist_and_ignore_conflict(tmp_path):
    p = _write(tmp_path, BASE + """
[[balancers]]
balance_type = "adapter_count"
blacklist_barcode02 = true
watch_barcode02 = false
""")
    with pytest.raises(ValueError, match="blacklisted and ignored"):
        parse_live_config_full(p)


def test_watcher_requires_watch_dir(tmp_path):
    p = _write(tmp_path, BASE + """
[[balancers]]
balance_type = "read_count"
""")
    with pytest.raises(ValueError, match="pod5_watch_dir"):
        parse_live_config_full(p)


def test_duplicate_names_rejected(tmp_path):
    p = _write(tmp_path, BASE + """
[[balancers]]
balance_type = "adapter_count"
channel_frac = 0.5

[[balancers]]
balance_type = "adapter_count"
channel_frac = 0.5
""")
    with pytest.raises(ValueError, match="[Dd]uplicate"):
        parse_live_config_full(p)


def test_explicit_channel_list(tmp_path):
    p = _write(tmp_path, BASE + """
[[balancers]]
balance_type = "reject_all"
channels = [1, 2, 3]

[[balancers]]
balance_type = "none"
channel_frac = 0.5
""")
    pc = parse_live_config_full(p)
    assert pc.balancers[0].channels == (1, 2, 3)
    bb = BarcodeBalancers.from_configs(4, pc.balancers,
                                       n_channels=pc.n_channels)
    assert all(bb.channel_map[c] == 0 for c in (1, 2, 3))
    # explicit channels never land in any other balancer's draw
    n0 = sum(1 for c, i in bb.channel_map.items() if i == 0)
    assert n0 == 3


def test_channel_num_assignment(tmp_path):
    p = _write(tmp_path, BASE + """
[[balancers]]
balance_type = "reject_all"
channel_num = 10

[[balancers]]
balance_type = "none"
channel_frac = 0.5
""")
    pc = parse_live_config_full(p)
    bb = BarcodeBalancers.from_configs(4, pc.balancers,
                                       n_channels=pc.n_channels)
    assert sum(1 for i in bb.channel_map.values() if i == 0) == 10


def test_min_max_channel_bounds(tmp_path):
    p = _write(
        tmp_path,
        BASE.replace('flowcell_type = "flongle"',
                     'flowcell_type = "flongle"\nmax_channel = 500'),
    )
    with pytest.raises(ValueError, match="max_channel"):
        parse_live_config_full(p)
    p2 = _write(
        tmp_path,
        BASE.replace('flowcell_type = "flongle"',
                     'flowcell_type = "flongle"\nmin_channel = 50\nmax_channel = 60'),
        name="live3.toml",
    )
    pc = parse_live_config_full(p2)
    bb = BarcodeBalancers.from_configs(
        4,
        pc.balancers or [BalancerConfig(channel_frac=1.0)],
        n_channels=pc.n_channels,
        min_channel=pc.min_channel,
        max_channel=pc.max_channel,
    )
    assert set(bb.channel_map) == set(range(50, 61))


def test_promethion_channel_count(tmp_path):
    p = _write(tmp_path, BASE.replace("flongle", "promethion"))
    assert parse_live_config_full(p).n_channels == 2675


# ---- behavior: per-balancer reject_duration drives the unblock call --------

class _Client:
    is_running = False

    def __init__(self):
        self.unblocked = []
        self.stopped = []

    def stop_receiving_read(self, ch, num):
        self.stopped.append((ch, num))

    def unblock_read(self, ch, num, duration):
        self.unblocked.append((ch, num, duration))


def test_reject_duration_reaches_unblock(tmp_path):
    """Two balancers with different reject_durations -> different unblock
    durations on the wire (reference worker.py:196-205)."""
    from warpdemux_tpu.live.session import ReadObject
    from warpdemux_tpu.models.registry import load_model

    model = load_model("WDX4_rna004_v1_0")
    cfg = SessionConfig(
        model_name="WDX4_rna004_v1_0",
        save_path=str(tmp_path),
        run_id="rd",
        reject_duration=0.05,
        max_signal_after_polya=10_000,
    )
    b_fast = BalancerConfig(balance_type="reject_all", name="fast",
                            reject_duration=0.15, channels=(1,))
    b_slow = BalancerConfig(balance_type="reject_all", name="slow",
                            reject_duration=0.45, channels=(2,))
    b_default = BalancerConfig(balance_type="reject_all", name="default",
                               channels=(3,))
    balancers = BarcodeBalancers.from_configs(
        4, [b_fast, b_slow, b_default], n_channels=4
    )
    client = _Client()
    session = Session(client, cfg, balancers, model=model)

    for ch in (1, 2, 3):
        ro = ReadObject(
            channel=ch, read_id=f"r{ch}", read_number=ch,
            signal=np.zeros(1000, np.float32), polya_start=900,
            barcode=0, outcome="classified",
        )
        session._decide_and_act(ro)
    session.reporter.close()
    durations = {ch: d for ch, _, d in client.unblocked}
    assert durations[1] == 0.15
    assert durations[2] == 0.45
    assert durations[3] == 0.05  # global [balancing] reject_duration
