"""Exercise the gradio demo wiring with a stub (gradio absent in this env):
build_demo must construct the Blocks graph and register the click handler,
and the handler must call sample_one with the UI arguments mapped through."""

import sys
import types

import numpy as np


class _Component:
    def __init__(self, *a, **k):
        pass


class _Blocks:
    def __init__(self, *a, **k):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _install_gradio_stub(registry):
    gr = types.ModuleType("gradio")
    gr.__spec__ = __import__("importlib.machinery", fromlist=["x"]) \
        .ModuleSpec("gradio", None)

    class Button(_Component):
        def click(self, fn, inputs, outputs):
            registry["fn"] = fn
            registry["n_inputs"] = len(inputs)

    gr.Blocks = _Blocks
    gr.Markdown = _Component
    gr.Row = _Blocks
    gr.Image = _Component
    gr.Video = _Component
    gr.Slider = _Component
    gr.Number = _Component
    gr.Button = Button
    sys.modules["gradio"] = gr
    return gr


def test_build_demo_wires_generate(monkeypatch, tmp_path):
    registry = {}
    _install_gradio_stub(registry)
    try:
        calls = {}

        def fake_sample_one(image_path, checkpoint, **kw):
            calls["image_path"] = image_path
            calls["kw"] = kw
            frames = np.zeros((2, 8, 8, 3), np.uint8)
            return frames, "ENGINE", "PARAMS"

        # patch BEFORE build_demo: the handler binds sample_one at build time
        import v3d_tpu.apps.generate as gen

        monkeypatch.setattr(gen, "sample_one", fake_sample_one)

        def fake_write_video(path, frames, fps=3):
            calls["video_path"] = path

        import v3d_tpu.data.video_io as vio

        monkeypatch.setattr(vio, "write_video", fake_write_video)

        from v3d_tpu.apps import serve

        demo = serve.build_demo(checkpoint=None)
        assert demo is not None
        assert registry["n_inputs"] == 6

        out = registry["fn"]("img.png", 0.3, 3.5, 3.5, 6, 23)
        assert calls["image_path"] == "img.png"
        assert calls["kw"]["decoding_t"] == 6
        assert calls["kw"]["seed"] == 23
        assert calls["kw"]["border_ratio"] == 0.3
        assert out == calls["video_path"]
    finally:
        sys.modules.pop("gradio", None)
