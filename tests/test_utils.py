"""Utils tests: KV logger sinks, config factory, torch converter layout."""

import json
import os

import numpy as np
import pytest


def test_kv_logger_sinks(tmp_path):
    from flair_tpu.utils import logging as L

    L.configure(dir=str(tmp_path), format_strs=["json", "csv", "log"])
    L.logkv("loss", 1.5)
    L.logkv_mean("acc", 1.0)
    L.logkv_mean("acc", 0.0)
    out = L.dumpkvs()
    assert out["loss"] == 1.5 and out["acc"] == 0.5
    L.logkv("loss", 2.0)
    L.logkv("new_col", 7)
    L.dumpkvs()
    L.get_current().close()

    with open(tmp_path / "progress.json") as f:
        rows = [json.loads(line) for line in f]
    assert rows[0]["loss"] == 1.5
    csv_text = (tmp_path / "progress.csv").read_text()
    assert "new_col" in csv_text.splitlines()[0]


def test_profile_kv(tmp_path):
    from flair_tpu.utils import logging as L

    L.configure(dir=str(tmp_path), format_strs=[])
    with L.profile_kv("myscope"):
        pass
    assert "wait_myscope" in L.get_current().name2val


def test_create_model_and_diffusion():
    from flair_tpu.utils.config import create_model_and_diffusion

    model, diffusion = create_model_and_diffusion(
        task="gaussian", timestep_respacing="10"
    )
    assert diffusion.num_timesteps == 10
    from flair_tpu.models.adm import BlurUNet

    assert isinstance(model, BlurUNet)

    model, diffusion = create_model_and_diffusion(task="x8_bicubic")
    assert diffusion.num_timesteps == 2000


def test_torch_converter_layouts():
    torch = pytest.importorskip("torch")
    from flair_tpu.utils.checkpoint import (
        convert_torch_params,
        t2j_conv2d,
        t2j_linear,
        load_torch_state_dict,
    )
    import tempfile

    lin = torch.nn.Linear(4, 8)
    conv = torch.nn.Conv2d(3, 5, 3)
    sd = {"lin.weight": lin.weight, "lin.bias": lin.bias,
          "conv.weight": conv.weight}
    with tempfile.NamedTemporaryFile(suffix=".pt") as f:
        torch.save(sd, f.name)
        state = load_torch_state_dict(f.name)
    params = convert_torch_params(
        state,
        {
            "lin.weight": ("mlp/kernel", t2j_linear),
            "lin.bias": ("mlp/bias", None),
            "conv.weight": ("conv/kernel", t2j_conv2d),
        },
    )
    assert params["mlp"]["kernel"].shape == (4, 8)
    assert params["conv"]["kernel"].shape == (3, 3, 3, 5)
    # numerics: y = x @ W.T + b == x @ kernel + b
    x = np.random.RandomState(0).randn(2, 4).astype(np.float32)
    want = lin(torch.from_numpy(x)).detach().numpy()
    got = x @ np.asarray(params["mlp"]["kernel"]) + np.asarray(
        params["mlp"]["bias"]
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
