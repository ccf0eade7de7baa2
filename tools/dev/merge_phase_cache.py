"""Merge PHASE_JSON lines from manual `bench.py --phase X` runs into
BENCH_LOCAL.json (the last-good cache the driver-facing bench emits from
when the tunnel is wedged).

Usage: python tools/dev/merge_phase_cache.py LOGFILE [LOGFILE...]
"""

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
CACHE = ROOT / "BENCH_LOCAL.json"


def main():
    cache = json.loads(CACHE.read_text()) if CACHE.exists() else {"detail": {}}
    detail = cache.setdefault("detail", {})
    merged = []
    for logf in sys.argv[1:]:
        if not Path(logf).exists():  # mid-queue merges: later logs absent
            continue
        for line in Path(logf).read_text().splitlines():
            if not line.startswith("PHASE_JSON:"):
                continue
            frag = json.loads(line[len("PHASE_JSON:"):])
            if "value" in frag:  # primary fragment
                cache["value"] = frag["value"]
                cache["vs_baseline"] = round(frag["vs_baseline"], 4)
                detail.update(frag["detail"])
                merged += list(frag["detail"])
            else:
                detail.update(frag)
                merged += list(frag)
    # derived roll-ups (mirrors bench.py orchestration)
    if "e2e_480p81f_50steps_s" in detail:
        detail["sec_per_video_480p_e2e"] = round(
            detail["e2e_480p81f_50steps_s"] + detail.get("t5_xxl_encode_s", 0.0), 2)
    if "dit_720p_step_s" in detail:
        detail["sec_per_video_720p_50steps_derived"] = round(
            detail.get("t5_xxl_encode_s", 0.0) + 50 * detail["dit_720p_step_s"]
            + detail.get("vae_decode_720p_s", 0.0), 2)
    if "e2e_720p_50steps_denoise_s" in detail:
        detail["sec_per_video_720p_e2e"] = round(
            detail["e2e_720p_50steps_denoise_s"]
            + detail.get("vae_decode_720p_s", 0.0)
            + detail.get("t5_xxl_encode_s", 0.0), 2)
    if not merged:
        # nothing new: leave the cache (and its measured_at provenance)
        # untouched — bumping the timestamp would falsely date old numbers
        print("merged keys: [] (cache left untouched)")
        return
    cache["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    cache["detail"].pop("provenance", None)
    CACHE.write_text(json.dumps(cache, indent=1) + "\n")
    print(f"merged keys: {sorted(set(merged))}")
    print(f"cache now: value={cache.get('value')} vs={cache.get('vs_baseline')}")


if __name__ == "__main__":
    main()
