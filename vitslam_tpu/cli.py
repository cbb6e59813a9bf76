"""CLI — the ``training/run_model.py`` equivalent.

Usage:
    python run_model.py --config train_featureAlignedVGGT_vkitti \
        [--config-dir configs] [--num_nodes N] [--set key=value ...]

Reference parity (run_model.py:420-490): --config selects the experiment;
mode (train/validate/test) comes from the config; multi-node runs
initialize jax.distributed (--num_nodes; --num_devices is implicit in JAX —
all local devices join the mesh). ``--set a.b=c`` overrides dotted config
paths (hydra-style overrides).
"""
from __future__ import annotations

import argparse
import os
import sys


def build_from_config(cfg):
    """Instantiate (model, loss, metrics, train_data, val/test_data,
    initial params) from a composed config."""
    import jax
    from .config.loader import instantiate
    from .io.checkpoint import load_model_params

    model = instantiate(cfg["model"])
    loss = instantiate(cfg["loss"])
    metrics = instantiate(cfg["metrics"]) if "metrics" in cfg else None

    data_cfg = cfg.get("data", {})
    train_data = instantiate(data_cfg["train"]) if "train" in data_cfg else None
    val_data = None
    for split in ("val", "test"):
        # default_dataset.yaml ships datasets-less val/test TEMPLATES
        # (common_config only); only instantiate a split the experiment
        # actually filled with datasets
        if data_cfg.get(split, {}).get("dataset_configs_or_datasets"):
            val_data = instantiate(data_cfg[split])
    if train_data is not None:
        train_data.seed = int(cfg.get("seed_value", 42))

    params = None
    ckpt_cfg = cfg.get("checkpoint", {})
    explicit = ckpt_cfg.get("model_checkpoint_path")
    pretrained = ckpt_cfg.get("from_pretrained")
    if explicit or pretrained:
        import jax.numpy as jnp

        img = int(cfg.get("img_size", 518))
        sample = jnp.zeros((1, 2, 3, img, img), jnp.bfloat16)
        template = jax.jit(model.init, static_argnums=(2,))(
            jax.random.PRNGKey(0), sample, 1
        )
        if explicit:
            params = load_model_params(explicit, template,
                                       fallback_path=pretrained)
        elif pretrained and os.path.exists(str(pretrained)):
            params = load_model_params(pretrained, template)
        else:
            print(f"warning: pretrained checkpoint {pretrained!r} not found "
                  "locally; starting from random init", file=sys.stderr)
    return model, loss, metrics, train_data, val_data, params


def main(argv=None):
    parser = argparse.ArgumentParser(description="vitslam_tpu runner")
    parser.add_argument("--config", required=True)
    parser.add_argument("--config-dir", default="configs")
    parser.add_argument("--num_nodes", type=int, default=1)
    parser.add_argument("--num_devices", type=int, default=0,
                        help="local devices to use for the data mesh "
                             "(0 = all; reference CLI parity)")
    parser.add_argument("--coordinator", default=None,
                        help="host:port of process 0 (multi-node)")
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--set", action="append", default=[],
                        metavar="KEY=VALUE", dest="overrides")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (tpu/cpu); overrides the "
                             "environment's default backend")
    args = parser.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # persistent compile cache, split by platform (cpu AOT blobs are
    # machine-specific — utils/cache.py)
    from .utils.cache import enable_compile_cache

    enable_compile_cache(os.getcwd(), args.platform)
    if args.num_nodes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_nodes,
            process_id=args.process_id,
        )

    from .config.loader import compose
    from .train.trainer import Trainer

    # overrides land pre-interpolation (hydra semantics), so e.g.
    # --set img_size=140 reaches every ${img_size} consumer
    cfg = compose(args.config, args.config_dir, overrides=args.overrides)
    if args.num_devices:
        cfg["num_devices"] = args.num_devices

    model, loss, metrics, train_data, val_data, params = build_from_config(cfg)
    trainer = Trainer(
        cfg, model, loss, train_data=train_data, val_data=val_data,
        metrics=metrics, params=params,
        shape_buckets=cfg.get("shape_buckets"),
    )

    mode = cfg.get("mode", "train")
    if mode == "train":
        trainer.fit()
    elif mode == "validate":
        if trainer.state is None and trainer.params is None:
            first = next(val_data.get_loader(epoch=0))
            trainer.init_state(first)
        print(trainer.validate(0))
    elif mode == "test":
        if trainer.params is None:
            first = next(val_data.get_loader(epoch=0))
            trainer.init_state(first)
        print(trainer.test())
    else:
        raise ValueError(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
