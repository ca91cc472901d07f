"""Project setup tool: scaffolding, dependency checks, install self-test.

Parity with reference setup.py (ProjectSetup, setup.py:35-636): creates the
experiment directory layout, verifies the runtime stack, generates default
configs, and runs an install self-test (imports, device matmul, a mini-DEER
forward, a plot save, config load — reference setup.py:512-600).

Usage:
    python -m tpu_deer.setup_tool [--root DIR] [--test] [--quick-config]
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys

REQUIRED = ("jax", "flax", "optax", "numpy", "scipy", "yaml", "matplotlib")
OPTIONAL = ("cv2", "pandas", "transformers")

DIRS = (
    "experiments",
    "checkpoints",
    "data",
    "logs",
    "configs",
)


def check_dependencies(verbose: bool = True) -> dict[str, bool]:
    status = {}
    for mod in REQUIRED + OPTIONAL:
        try:
            importlib.import_module(mod)
            status[mod] = True
        except ImportError:
            status[mod] = False
        if verbose:
            tag = "required" if mod in REQUIRED else "optional"
            print(f"  [{'OK' if status[mod] else '--'}] {mod} ({tag})")
    return status


def setup_project_structure(root: str = ".") -> list[str]:
    created = []
    for d in DIRS:
        path = os.path.join(root, d)
        if not os.path.isdir(path):
            os.makedirs(path, exist_ok=True)
            created.append(path)
    return created


def generate_configs(root: str = ".") -> list[str]:
    from tpu_deer.utils.config import default_config, save_yaml_config

    paths = []
    full = os.path.join(root, "configs", "config.yaml")
    if not os.path.exists(full):
        save_yaml_config(default_config(), full)
        paths.append(full)
    quick = os.path.join(root, "configs", "quick_config.yaml")
    if not os.path.exists(quick):
        cfg = default_config()
        cfg["training"].update(num_epochs=5, batch_size=8, warmup_epochs=1)
        cfg["datasets"]["names"] = []
        save_yaml_config(cfg, quick)
        paths.append(quick)
    return paths


def run_install_test() -> bool:
    """Install self-test: imports → device op → mini model → plot → config."""
    import tempfile

    import numpy as np

    ok = True
    try:
        import jax
        import jax.numpy as jnp

        x = jnp.ones((64, 64))
        y = (x @ x).block_until_ready()
        assert float(y[0, 0]) == 64.0
        print(f"  [OK] device matmul on {jax.devices()[0].platform}")
    except Exception as e:
        print(f"  [FAIL] device matmul: {e}")
        ok = False

    try:
        import jax
        import jax.numpy as jnp

        from tpu_deer.models.deer_model import (
            DEERModelConfig,
            create_complete_deer_model,
        )

        model, params = create_complete_deer_model(
            DEERModelConfig(encoder_dim=32, fusion_dim=64, encoder_layers=1),
            seed=0,
        )
        out = model.apply(
            {"params": params},
            jnp.zeros((2, 84)), jnp.zeros((2, 256)), jnp.zeros((2, 768)),
        )
        assert out["mu_all"].shape == (2, 3)
        print("  [OK] mini-DEER forward")
    except Exception as e:
        print(f"  [FAIL] mini-DEER forward: {e}")
        ok = False

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.plot([0, 1], [0, 1])
        with tempfile.NamedTemporaryFile(suffix=".png") as f:
            fig.savefig(f.name)
        plt.close(fig)
        print("  [OK] plot save")
    except Exception as e:
        print(f"  [FAIL] plot save: {e}")
        ok = False

    try:
        from tpu_deer.utils.config import load_yaml_config

        cfg = load_yaml_config(None)
        assert cfg["model"]["audio_dim"] == 84
        print("  [OK] config load")
    except Exception as e:
        print(f"  [FAIL] config load: {e}")
        ok = False
    return ok


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="tpu_deer project setup")
    p.add_argument("--root", default=".")
    p.add_argument("--test", action="store_true", help="run install self-test")
    args = p.parse_args(argv)

    print("Checking dependencies:")
    status = check_dependencies()
    missing = [m for m in REQUIRED if not status[m]]
    if missing:
        print(f"missing required deps: {missing}")
        return 1

    created = setup_project_structure(args.root)
    print(f"created {len(created)} directories")
    configs = generate_configs(args.root)
    print(f"generated {len(configs)} config files")

    if args.test:
        print("Install self-test:")
        if not run_install_test():
            return 1
    print("setup complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
