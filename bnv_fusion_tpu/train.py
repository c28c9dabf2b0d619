"""Training entry point (embedding pretraining / refinement-as-training).

CLI-compatible rebuild of reference src/train.py:

    python -m bnv_fusion_tpu.train model=fusion_pointnet_model \\
        dataset=synthetic_patches
    python -m bnv_fusion_tpu.train model=fusion_refiner_model \\
        dataset=synthetic_demo model.sparse_volume_path=...npz

Dispatches on the registered model name like the reference's registry
(src/models/models.py), with the refiner flow (reference §3.2 second variant)
routed through FusionRefiner.
"""

from __future__ import annotations

import os
import sys

from bnv_fusion_tpu.config import load_config
from bnv_fusion_tpu.utils.logging import get_logger, print_config

log = get_logger(__name__)


def main(argv=None):
    cfg = load_config(list(argv if argv is not None else sys.argv[1:]))
    print_config(cfg)
    from bnv_fusion_tpu.datasets import get_dataset
    from bnv_fusion_tpu.models import get_model

    name = cfg.model.name
    out_dir = os.path.join(cfg.output_dir, "train", name)
    os.makedirs(out_dir, exist_ok=True)

    if name == "lit_fusion_pointnet":
        trainer_cls = get_model(name)
        trainer = trainer_cls(cfg)
        train_ds = get_dataset(cfg, "train")
        val_ds = get_dataset(cfg, "val")
        best = trainer.fit(
            train_ds, val_ds,
            max_epochs=int(cfg.trainer.max_epochs),
            batch_size=int(getattr(cfg.dataset, "train_batch_size", 32)),
            ckpt_dir=out_dir)
        log.info(f"best val loss {best:.4f}; checkpoints in {out_dir}")
        return 0

    if name == "lit_fusion_refiner":
        from bnv_fusion_tpu.run_e2e import load_params

        params = load_params(cfg)
        refiner_cls = get_model(name)
        refiner = refiner_cls(cfg, params)
        dataset = get_dataset(cfg, "val")
        refiner.run(dataset, out_dir,
                    n_epochs=int(cfg.trainer.max_epochs))
        return 0

    raise KeyError(f"no training flow for model '{name}'")


if __name__ == "__main__":
    sys.exit(main())
