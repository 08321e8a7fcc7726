"""Torch-facing consumer: the reference's `SampleDataset`
(/root/reference/tools/sampleDataset.py:9-110) re-expressed over the
engine's per-stay outputs.

Parity map (reference file:line → here):
- stay catalog from output dirs (:19-22)        → dataset.list_stays
- feature axis from d_items (:26-29)            → caller passes feature_ids
  (dataset.load_feature_catalog builds it Spark-side)
- per-source concat (:88-98)                    → dataset.load_stay_matrix
- reindex-to-catalog + zero-fill (:100-106)     → dataset.load_stay_matrix
- (X, Y) __getitem__ (:77-110)                  → SampleDataset.__getitem__
- padding_collate (:65-72)                      → SampleDataset.padding_collate

Documented divergences (SURVEY.md §3.3 "note, not replicate"):
- The reference reads "inputevent_features.csv" (:91) — a filename typo;
  the sink writes "inputevents_features.csv", so inputevents silently
  vanish from training data there. Here the correct plural name is used.
- procedureevents is included in the default source list (the reference
  hardcodes 3 of its own 4 sinks).

torch is NOT a dependency of the engine: when it is importable the
dataset yields torch tensors and is a genuine `torch.utils.data.Dataset`
(DataLoader workers, pin_memory — reference :126-128 — all work, because
__getitem__ only touches files + numpy). Without torch, __getitem__
yields float64 numpy arrays with identical values/shapes, which is what
the tests pin; the collate helpers are the only torch-only surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from mimic2ts_spark.dataset import DEFAULT_SOURCES, list_stays, load_stay_matrix

try:  # optional, consumer-side only
    import torch

    _BASE = torch.utils.data.Dataset
except Exception:  # pragma: no cover - container has no torch
    torch = None
    _BASE = object


class SampleDataset(_BASE):
    """(X, Y) samples per stay: X = (n_features, n_buckets) float matrix on
    the full feature catalog, zero-filled; Y = the stay's label row.

    `labels` is indexed by stay_id (reference :81 uses .loc[stay_id]).
    `feature_ids` pins the row axis; None keeps each stay's own features
    (the reference requires the d_items catalog — pass
    dataset.load_feature_catalog(...) for parity).
    """

    def __init__(
        self,
        labels: pd.DataFrame,
        processed_mimic_path: str,
        stay_ids: list[int] | None = None,
        feature_ids: list[int] | None = None,
        sources: tuple[str, ...] = DEFAULT_SOURCES,
    ):
        self.stay_ids = (
            list(stay_ids) if stay_ids is not None else list_stays(processed_mimic_path)
        )
        self.feature_ids = feature_ids
        self.labels = labels
        self.processed_mimic_path = processed_mimic_path
        self.sources = sources

    def __len__(self) -> int:
        return len(self.stay_ids)

    def _item_arrays(self, index: int) -> tuple[np.ndarray, np.ndarray]:
        stay_id = self.stay_ids[index]
        y = np.asarray(self.labels.loc[stay_id].values, dtype="float64")
        x = load_stay_matrix(
            self.processed_mimic_path,
            stay_id,
            feature_ids=self.feature_ids,
            sources=self.sources,
        ).to_numpy(dtype="float64")
        return x, y

    def __getitem__(self, index: int):
        x, y = self._item_arrays(index)
        if torch is None:
            return x, y
        return torch.from_numpy(x), torch.from_numpy(y)

    @staticmethod
    def padding_collate(batch):
        """Reference :65-72: right-pad each (features, buckets) matrix along
        the bucket axis to the batch max (transpose → pad_sequence)."""
        if torch is None:  # pragma: no cover
            raise ImportError("padding_collate requires torch")
        from torch.nn.utils.rnn import pad_sequence

        x_padded = pad_sequence(
            [torch.transpose(X, 0, 1) for X, _ in batch], batch_first=True
        )
        y = torch.stack([Y for _, Y in batch], dim=0)
        return x_padded.float(), y.float()
