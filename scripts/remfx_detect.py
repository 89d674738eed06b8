#!/usr/bin/env python
"""Single-file detect + remove (reference scripts/remfx_detect.py):
    python scripts/remfx_detect.py +exp=remfx_detect +audio_input=in.wav \
        +output_path=out.wav
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from remfx_tpu.utils import runtime  # noqa: E402

runtime.setup()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from remfx_tpu.chain.build import build_chain  # noqa: E402
from remfx_tpu.config.core import parse_cli  # noqa: E402
from remfx_tpu.data.wav import read_wav, write_wav  # noqa: E402
from remfx_tpu.ops.resample import resample  # noqa: E402


def main():
    cfg = parse_cli(sys.argv[1:])
    in_path = cfg.get("audio_input")
    if not in_path:
        raise SystemExit("pass +audio_input=path/to.wav")
    out_path = cfg.get("output_path") or "output.wav"

    audio, sr = read_wav(in_path)
    if sr != cfg["sample_rate"]:
        audio = np.asarray(resample(jnp.asarray(audio), sr, cfg["sample_rate"]))
    audio = audio.sum(0, keepdims=True)  # mono (1, T)

    # Streaming: fixed-size overlapped windows -> ONE compile signature
    # for any file length (each distinct length would otherwise be a
    # fresh multi-minute XLA compile; see chain/stream.py).
    chunk = int(cfg.get("stream_chunk", cfg["chunk_size"]))
    example = jnp.zeros((1, audio.shape[0], chunk), jnp.float32)
    chain = build_chain(cfg, example)

    from remfx_tpu.chain.stream import stream_chain
    from remfx_tpu import ALL_EFFECTS, EFFECT_CLASS_NAMES

    y, labels = stream_chain(chain, audio.astype(np.float32), chunk=chunk)
    present = [
        name for name in chain.effect_order
        if labels[ALL_EFFECTS.index(EFFECT_CLASS_NAMES[name])] > 0.5
    ]
    print("Detected effects:", present)
    print("Removing effects...")
    write_wav(out_path, y[:, : audio.shape[-1]], cfg["sample_rate"])
    print(f"Saved output to {out_path}")


if __name__ == "__main__":
    main()
