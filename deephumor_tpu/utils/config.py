"""Experiment configuration layer.

The reference's configuration story is kwargs + per-model hp dicts +
notebook forms (SURVEY.md §5 config entry). This is the single dataclass
layer that round-trips those hp dicts and adds training/data/sampling
config with JSON persistence.
"""

import dataclasses
import json

from deephumor_tpu.models import MODEL_REGISTRY

__all__ = ["TrainConfig", "SamplingConfig", "ExperimentConfig"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-3
    clip_norm: float = 3.0
    weight_decay: float = 0.0
    n_epochs: int = 50
    batch_size: int = 256
    max_caption_len: int = 32
    max_label_len: int = 8
    seed: int = 0
    log_grad_norm: bool = False


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Generation defaults; the reference demo's word/char presets are
    the two classmethods (notebook cell 35)."""

    max_len: int = 32
    beam_size: int = 10
    top_k: int = 70
    temperature: float = 1.0
    sampler: str = "exact"
    greedy: bool = False

    @classmethod
    def word_default(cls):
        return cls(max_len=32, beam_size=10, top_k=70, temperature=1.0)

    @classmethod
    def char_default(cls):
        return cls(max_len=128, beam_size=7, top_k=50, temperature=1.1)

    def generate_kwargs(self):
        return dataclasses.asdict(self)


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    """Model + training + sampling in one round-trippable record."""

    model_type: str
    model_hp: dict
    train: TrainConfig = TrainConfig()
    sampling: SamplingConfig = SamplingConfig()
    title: str = "experiment"

    def build_model(self):
        """Instantiates the model dataclass from the stored hp (the same
        contract as the reference's ``ModelClass(**hp)``,
        caption_models.py:449-459)."""
        return MODEL_REGISTRY[self.model_type](**self.model_hp)

    def save(self, path):
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def load(cls, path):
        with open(path) as f:
            raw = json.load(f)
        raw["train"] = TrainConfig(**raw.get("train", {}))
        raw["sampling"] = SamplingConfig(**raw.get("sampling", {}))
        return cls(**raw)

    @classmethod
    def from_model(cls, model, **kwargs):
        """Builds a config from a live model dataclass."""
        return cls(model_type=model.model_type, model_hp=model.hp(),
                   **kwargs)
