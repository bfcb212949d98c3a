"""Tortoise-detect CLI (reference: tortoise/is_this_from_tortoise.py)."""
from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--clip", required=True)
    parser.add_argument("--model_dir", default=None)
    args = parser.parse_args(argv)

    import jax

    from tortoise_tpu import weights as weights_lib
    from tortoise_tpu.models.classifier import (AudioMiniEncoderWithClassifierHead,
                                                ClassifierConfig, classify_audio_clip)
    from tortoise_tpu.utils.audio import load_audio

    clip = load_audio(args.clip, 24000)
    model = AudioMiniEncoderWithClassifierHead(ClassifierConfig())
    params, _ = weights_lib.get_params(
        "classifier",
        lambda: model.init(jax.random.PRNGKey(0),
                           jax.numpy.zeros((1, 1024, 1)))["params"],
        args.model_dir)
    prob = classify_audio_clip(clip[0], {"params": params})
    print(f"This classifier thinks there is a {prob * 100:.2f}% chance that this "
          "clip was generated from Tortoise.")


if __name__ == "__main__":
    main()
