import pytest

from v3d_tpu.core import instantiate, make_config, register, resolve


def test_registry_and_instantiate():
    cfg = {
        "target": "euler_edm_sampler",
        "params": {
            "num_steps": 25,
            "discretization": {
                "target": "edm_discretization",
                "params": {"sigma_max": 700.0},
            },
            "guider": {
                "target": "linear_prediction_guider",
                "params": {"max_scale": 3.5, "num_frames": 18},
            },
        },
    }
    import v3d_tpu.diffusion  # noqa: F401 — populate registry

    sampler = instantiate(cfg)
    assert sampler.num_steps == 25
    assert sampler.discretization.sigma_max == 700.0
    assert sampler.guider.num_frames == 18


def test_dotted_path_restricted():
    with pytest.raises(ValueError):
        resolve("os.system")


def test_config_overrides():
    cfg = make_config(
        {"model": {"params": {"lr": 1e-4, "steps": 100}}},
        overrides=["model.params.lr=3e-5", "model.params.name=unet"],
    )
    assert cfg.model.params.lr == 3e-5
    assert cfg.model.params.steps == 100
    assert cfg.model.params.name == "unet"
