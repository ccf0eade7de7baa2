"""Utils tests: video IO roundtrip, metrics, misc, media budgeting."""

import numpy as np
import pytest

from omnivideo_tpu.utils.metrics import (
    evaluate_pair,
    motion_magnitude,
    psnr,
    ssim,
    temporal_consistency,
)
from omnivideo_tpu.utils.misc import best_output_size, masks_like, str2bool
from omnivideo_tpu.utils.qwen_vl_media import smart_nframes, smart_resize
from omnivideo_tpu.utils.video import (
    read_video_frames,
    sample_and_transform_frames,
    save_video,
)


def test_video_roundtrip_npz(tmp_path):
    v = np.random.default_rng(0).uniform(-1, 1, (3, 5, 16, 16)).astype(np.float32)
    out = save_video(str(tmp_path / "clip.npz"), v, fps=8)
    frames, fps = read_video_frames(out)
    assert frames.shape == (5, 16, 16, 3) and fps == 8


def test_video_gif_fallback(tmp_path):
    # varying frames (PIL's GIF writer collapses identical frames)
    v = np.linspace(-1, 1, 3 * 4 * 8 * 8, dtype=np.float32).reshape(3, 4, 8, 8)
    out = save_video(str(tmp_path / "clip.gif"), v, fps=8)
    assert out.endswith(".gif")
    frames, _ = read_video_frames(out)
    assert frames.shape[0] == 4


def test_video_mp4_fallback_is_playable_avi(tmp_path):
    """In a codec-less env, an .mp4 request becomes an MJPEG AVI a standard
    player can open (reference writes mp4 via libx264, utils.py:160-198)."""
    v = np.random.default_rng(0).uniform(-1, 1, (3, 5, 32, 48)).astype(np.float32)
    out = save_video(str(tmp_path / "clip.mp4"), v, fps=12)
    assert out.endswith((".avi", ".mp4"))
    frames, fps = read_video_frames(out)
    assert frames.shape == (5, 32, 48, 3)
    assert abs(fps - 12) < 0.5


def test_on_device_uint8_matches_host_quantization(tmp_path):
    """pipelines.x2x.video_to_uint8_frames (on-device quantize, 4x smaller
    tunnel fetch) must be byte-identical to utils.video._to_uint8, and
    save_video must pass the pre-quantized frames through untouched."""
    from omnivideo_tpu.pipelines.x2x import video_to_uint8_frames
    from omnivideo_tpu.utils.video import _to_uint8

    rng = np.random.default_rng(5)
    v = rng.uniform(-1.3, 1.3, (3, 4, 16, 16)).astype(np.float32)
    host = _to_uint8(v)
    dev = np.asarray(video_to_uint8_frames(v))
    assert dev.shape == host.shape == (4, 16, 16, 3)
    np.testing.assert_array_equal(dev, host)
    # uint8 passthrough (THWC and CTHW forms)
    np.testing.assert_array_equal(_to_uint8(host), host)
    np.testing.assert_array_equal(_to_uint8(host.transpose(3, 0, 1, 2)), host)
    out = save_video(str(tmp_path / "clip.npz"), dev, fps=8)
    frames, _ = read_video_frames(out)
    np.testing.assert_array_equal(frames, host)


def test_mjpeg_avi_container_structure(tmp_path):
    """RIFF/AVI header invariants + frame count + JPEG fidelity."""
    import struct

    from omnivideo_tpu.utils.avi import read_mjpeg_avi, write_mjpeg_avi

    rng = np.random.default_rng(1)
    # smooth frames (JPEG is lossy; gradients survive quality 92 well)
    base = np.linspace(0, 255, 64 * 48, dtype=np.float32).reshape(48, 64)
    frames = np.stack(
        [np.stack([np.roll(base, i * 3, axis=1)] * 3, -1) for i in range(7)]
    ).astype(np.uint8)
    path = write_mjpeg_avi(str(tmp_path / "c.avi"), frames, fps=16)

    raw = open(path, "rb").read()
    assert raw[:4] == b"RIFF" and raw[8:12] == b"AVI "
    (riff_size,) = struct.unpack("<I", raw[4:8])
    assert riff_size == len(raw) - 8  # size field consistent
    assert b"MJPG" in raw[:200] and b"vids" in raw[:200]
    assert raw.count(b"00dc") == 7 * 2  # one movi chunk + one idx1 entry each

    back, fps = read_mjpeg_avi(path)
    assert back.shape == frames.shape and abs(fps - 16) < 0.5
    err = np.abs(back.astype(np.float32) - frames.astype(np.float32)).mean()
    assert err < 6.0, f"JPEG round-trip too lossy: {err}"


def test_sample_and_transform():
    frames = np.random.default_rng(1).integers(0, 255, (20, 32, 48, 3), np.uint8)
    clip = sample_and_transform_frames(frames, 9, (24, 16), src_fps=16, target_fps=8)
    assert clip.shape == (3, 9, 16, 24)
    assert clip.min() >= -1.0 and clip.max() <= 1.0


def test_metrics_identity_and_noise():
    rng = np.random.default_rng(2)
    v = rng.integers(0, 255, (6, 32, 32, 3), np.uint8)
    m = evaluate_pair(v, v)
    assert m["psnr"] == float("inf") and m["ssim"] > 0.999
    noisy = np.clip(v.astype(int) + rng.integers(-40, 40, v.shape), 0, 255).astype(np.uint8)
    assert psnr(v, noisy) < 30 and ssim(v, noisy) < 0.99
    frozen = np.repeat(v[:1], 6, axis=0)
    assert motion_magnitude(frozen) == 0.0
    assert temporal_consistency(frozen) > 0.999


def test_misc():
    assert str2bool("yes") and not str2bool("0")
    m = masks_like((4, 3, 8, 8), zero_first_frame=True)
    assert float(m[:, 0].max()) == 0.0 and float(m[:, 1].min()) == 1.0
    w, h = best_output_size(1920, 1080, 16, 16, 480 * 832)
    assert w % 16 == 0 and h % 16 == 0
    assert abs((w / h) - (1920 / 1080)) < 0.3


def test_smart_resize_budget():
    h, w = smart_resize(480, 832, factor=28, min_pixels=128 * 28 * 28,
                        max_pixels=768 * 28 * 28)
    assert h % 28 == 0 and w % 28 == 0
    assert 128 * 28 * 28 <= h * w <= 768 * 28 * 28 * 1.1


def test_smart_nframes():
    assert smart_nframes({"nframes": 6}, total_frames=100, video_fps=30) == 6
    n = smart_nframes({"fps": 2}, total_frames=120, video_fps=30)
    assert n % 2 == 0 and 4 <= n <= 120


def test_native_frame_ops_match_numpy():
    """C++ fused frame transforms == numpy reference (and roundtrip)."""
    from omnivideo_tpu.utils.frame_native import (
        chw_to_frames_u8,
        frames_to_chw_norm,
        sample_frames_to_chw_norm,
    )

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (7, 12, 10, 3), np.uint8)
    out = frames_to_chw_norm(frames)
    ref = (frames.astype(np.float32) / 127.5 - 1.0).transpose(3, 0, 1, 2)
    np.testing.assert_allclose(out, ref, atol=1e-6)

    idx = np.array([0, 2, 6])
    np.testing.assert_allclose(
        sample_frames_to_chw_norm(frames, idx),
        (frames[idx].astype(np.float32) / 127.5 - 1.0).transpose(3, 0, 1, 2),
        atol=1e-6,
    )
    np.testing.assert_array_equal(chw_to_frames_u8(ref), frames)


def test_chaos_dataset_retry_survives_injected_faults(tmp_path):
    """Fault injection (utils/chaos.py) drives the dataset's
    retry-on-corrupt path — CI coverage the reference never had for its
    equivalent (omnivideo_dataset_patched.py:46-50)."""
    import numpy as np

    from omnivideo_tpu.training.dataset import OmniVideoDataset, make_dummy_dataset
    from omnivideo_tpu.utils.chaos import inject_io_faults

    root = make_dummy_dataset(tmp_path / "d", n=6, text_len=4, vlm_len=4,
                              latent_shape=(4, 2, 4, 4), text_dim=8, vlm_dim=8)
    ds = OmniVideoDataset(str(root))
    with inject_io_faults(rate=0.4, seed=3, match="*.npz") as inj:
        got = [ds[i] for i in range(len(ds))]
    assert inj.injected > 0, "chaos must actually fire for this test to count"
    assert len(got) == len(ds) and all("latent_feature" in s for s in got)


def test_chaos_call_faults():
    from omnivideo_tpu.utils.chaos import inject_call_faults

    class Saver:
        def __init__(self):
            self.saved = 0

        def save(self):
            self.saved += 1

    s = Saver()
    failures = 0
    with inject_call_faults(s, "save", rate=0.5, seed=1) as inj:
        for _ in range(20):
            try:
                s.save()
            except RuntimeError:
                failures += 1
    assert failures == inj.injected > 0
    assert s.saved == 20 - failures
    s.save()  # restored, never raises
    assert s.saved == 21 - failures


@pytest.mark.slow
def test_bench_phase_protocol_a14b():
    """bench.py --phase a14b (CPU compile check) emits the PHASE_JSON line
    the orchestrator merges — CI coverage for the driver-facing bench
    protocol without touching a TPU."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    r = subprocess.run(
        [sys.executable, str(root / "bench.py"), "--phase", "a14b"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.startswith("PHASE_JSON:")]
    assert len(lines) == 1
    out = json.loads(lines[0][len("PHASE_JSON:"):])
    assert out["a14b_fsdp8_compile_s"] > 0


def test_bench_phase_protocol_qwen30b():
    """bench.py --phase qwen30b: the REAL 30B-A3B text config (48 layers,
    128 experts) compiles sharded over a virtual fsdp=8 mesh (VERDICT r2
    item 6)."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    r = subprocess.run(
        [sys.executable, str(root / "bench.py"), "--phase", "qwen30b"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.startswith("PHASE_JSON:")]
    out = json.loads(lines[-1][len("PHASE_JSON:"):])
    assert out["qwen30b_fsdp8_compile_s"] > 0
