"""HF-hub integration (hub.py) under a mocked ``huggingface_hub``.

The real dependency is absent in this (zero-egress) environment — which is
itself a tested branch: the ImportError message must name the optional
dependency. The download path is covered by injecting a fake
``huggingface_hub`` module whose ``hf_hub_download`` resolves to a real
synthetic reference checkpoint, proving ``from_pretrained`` feeds the
converter end to end (reference: src/flashmd/hub.py:8-83).
"""

import sys
import types
from pathlib import Path

import pytest

from flashmd_tpu import hub
from tests.helpers.synthetic_checkpoint import build_synthetic_checkpoint


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    return build_synthetic_checkpoint(tmp_path_factory.mktemp("hub_ckpt"))


@pytest.fixture
def fake_hf(monkeypatch, ckpt):
    """Install a fake huggingface_hub that serves the synthetic files."""
    calls = []

    def hf_hub_download(repo_id, filename, cache_dir=None, revision=None):
        calls.append(
            dict(repo_id=repo_id, filename=filename, cache_dir=cache_dir,
                 revision=revision)
        )
        if filename == "model_and_prior.pt":
            return str(ckpt["model_path"])
        return str(ckpt["structures_path"])

    mod = types.ModuleType("huggingface_hub")
    mod.hf_hub_download = hf_hub_download
    monkeypatch.setitem(sys.modules, "huggingface_hub", mod)
    return calls


def test_from_pretrained_feeds_the_converter(fake_hf, ckpt):
    ref = hub.from_pretrained(repo_id="someone/cg-model", revision="abc123")
    # the converter returned a bindable ReferenceModel with the SchNet term
    from flashmd_tpu.models.checkpoint_io import ReferenceModel

    assert isinstance(ref, ReferenceModel)
    assert ref.schnet_params is not None
    assert fake_hf == [
        dict(repo_id="someone/cg-model", filename="model_and_prior.pt",
             cache_dir=None, revision="abc123")
    ]


def test_download_file_returns_path(fake_hf, ckpt):
    p = hub.download_file(filename="1enh_configurations.pt")
    assert isinstance(p, Path)
    assert p == Path(ckpt["structures_path"])
    assert fake_hf[0]["filename"] == "1enh_configurations.pt"


def test_missing_dependency_raises_with_guidance(monkeypatch):
    """Without huggingface_hub the error must say exactly what to install
    (this is the live branch in this environment)."""
    monkeypatch.setitem(sys.modules, "huggingface_hub", None)
    with pytest.raises(ImportError, match="huggingface_hub"):
        hub.from_pretrained()
    with pytest.raises(ImportError, match="huggingface_hub"):
        hub.download_file()
