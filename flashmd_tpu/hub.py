"""HuggingFace Hub integration for pre-trained FlashMD models.

Re-design of the reference hub module (reference: src/flashmd/hub.py:8-83):
downloads ``model_and_prior.pt`` / structure files from the Hub and runs
them through the torch-free checkpoint converter
(flashmd_tpu.models.checkpoint_io). Requires ``huggingface_hub`` and
network access; both are optional dependencies of this framework.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional


def from_pretrained(
    repo_id: str = "pingzhili/cg-schnet",
    filename: str = "model_and_prior.pt",
    cache_dir: Optional[str] = None,
    revision: Optional[str] = None,
):
    """Download and convert a pre-trained model from the Hub.

    Returns a :class:`~flashmd_tpu.models.checkpoint_io.ReferenceModel`;
    bind it to a molecule with
    :func:`~flashmd_tpu.models.checkpoint_io.build_forcefield`.
    """
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover - optional dep
        raise ImportError(
            "from_pretrained requires the optional dependency "
            "huggingface_hub."
        ) from e

    local_path = hf_hub_download(
        repo_id=repo_id,
        filename=filename,
        cache_dir=cache_dir,
        revision=revision,
    )
    from .models.checkpoint_io import load_reference_checkpoint

    return load_reference_checkpoint(local_path)


def download_file(
    repo_id: str = "pingzhili/cg-schnet",
    filename: str = "1enh_configurations.pt",
    cache_dir: Optional[str] = None,
    revision: Optional[str] = None,
) -> Path:
    """Download a raw file (e.g. starting configurations) from the Hub."""
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover - optional dep
        raise ImportError(
            "download_file requires the optional dependency "
            "huggingface_hub."
        ) from e

    return Path(
        hf_hub_download(
            repo_id=repo_id,
            filename=filename,
            cache_dir=cache_dir,
            revision=revision,
        )
    )
