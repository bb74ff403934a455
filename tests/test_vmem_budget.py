"""Off-chip guard for the Mosaic scoped-VMEM limit (16 MiB per pallas_call).

Round 4's driver bench died compiling the fused-LSTM forward at the
ddim50/5-samp decode batch 640: the block chooser budgeted VMEM for a
single-program grid, but Mosaic DOUBLE-buffers streamed grid blocks
whenever the grid has >1 program, and the unpaired [T, bb, 64] state
outputs each tile-pad to 128 lanes — 19.50 MiB scoped stack vs the 16 MiB
limit ("Scoped allocation with size 19.50M and limit 16.00M",
BENCH_r04.json). Nothing off-chip could catch it: the interpret-mode tests
have no VMEM model and the on-chip script checked B=16 only.

These tests pin the analytic footprint model (`scoped_vmem_bytes`,
calibrated to reproduce Mosaic's reported sizes exactly on the observed
compile failures) and assert the chooser's pick fits for EVERY batch size
the repo's artifacts generate — so a kernel or blocking change that can
OOM the real chip fails here, on CPU, at test time.
"""

import pytest

from cld_tpu.ops.lstm_pallas import (
    SCOPED_VMEM_LIMIT,
    pick_block,
    scoped_vmem_bytes,
)

MiB = 1 << 20
T, H = 52, 64  # config of record: horizon 52, LSTM hidden 64
KINDS = ("fwd", "bwd_v1", "bwd_v2")

# every decode batch the artifacts generate: dryrun_multichip (16), unit
# tests (8/32), bench + closed-loop replans (128, incl. padded-agent scene
# packs), rollout CLI scales (100/320), ddim50 + the 5-samp closed-loop
# cadence (640), and a 2x headroom point (1280).
ARTIFACT_BATCHES = (8, 16, 32, 64, 100, 128, 256, 320, 512, 640, 1000, 1280)


@pytest.mark.parametrize("itemsize", [2, 4], ids=["bf16", "f32"])
@pytest.mark.parametrize("kind", KINDS)
def test_chosen_block_fits_scoped_vmem(kind, itemsize):
    for B in ARTIFACT_BATCHES:
        bb = pick_block(B, T, H, itemsize, kind)
        est = scoped_vmem_bytes(B, T, H, itemsize, kind, bb)
        assert est <= SCOPED_VMEM_LIMIT, (
            f"{kind} B={B} itemsize={itemsize}: chosen bb={bb} models "
            f"{est / MiB:.2f} MiB > 16 MiB — would fail to compile on TPU"
        )


def test_model_reproduces_observed_mosaic_sizes():
    """Calibration pins: the model must keep matching what Mosaic reported
    on the real chip, else the guard is fiction."""
    # bwd_v1 at B=128, bb=64 (grid=2): Mosaic reported a 17.88 MiB scoped
    # stack and refused to compile (lstm_pallas v1 docstring, round 3).
    est = scoped_vmem_bytes(128, T, H, 2, "bwd_v1", 64)
    assert est == pytest.approx(17.88 * MiB, rel=0.005)
    # the round-4 crash shape was the then-unpaired forward at bb=128,
    # grid=5: streams were [T,128,256] + four [T,128,64->128-lane-padded]
    # blocks, double-buffered = 19.50 MiB (BENCH_r04.json). The paired
    # forward emits two [T,128,128] state arrays instead; same shape now
    # models under 14 MiB and must keep bb=128 (one program per 128 rows).
    unpaired_streams = 2 * (T * 128 * 256 * 2 + 4 * (T * 128 * 128 * 2))
    assert unpaired_streams == pytest.approx(19.50 * MiB, rel=0.005)
    assert scoped_vmem_bytes(640, T, H, 2, "fwd", 128) < 14 * MiB


def test_crash_batch_keeps_full_blocks():
    """B=640 (ddim50 / 5-samp decode) must not force tiny blocks: the
    sweep inside each program is sequential, so halving bb doubles the
    latency-bound step count."""
    assert pick_block(640, T, H, 2, "fwd") == 128
    assert pick_block(640, T, H, 2, "bwd_v2") >= 64


def test_bench_batch_unchanged():
    """The measured-fast bench configs must not silently regress: fwd
    bb=128/grid=1 at B=128 (0.088 ms standalone) and a v2 backward block
    of at least 64."""
    assert pick_block(128, T, H, 2, "fwd") == 128
    assert pick_block(128, T, H, 2, "bwd_v2") >= 64


def test_pick_block_raises_when_nothing_fits():
    # an absurd hidden size that cannot fit even at bb=8
    with pytest.raises(ValueError, match="scoped VMEM"):
        pick_block(128, 512, 4096, 4, "bwd_v1")
