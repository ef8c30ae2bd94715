"""Experiment runtime: argument parsing, logging, backend selection.

Mirrors the reference's per-script ArgParse + LoggingExtras setup
(`/root/reference/scripts/darcy/solve_darcy_gmrf-fem.jl:21-52`).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def setup_logging() -> logging.Logger:
    logging.basicConfig(
        level=logging.INFO, format="[%(levelname)s] %(message)s", stream=sys.stderr
    )
    return logging.getLogger("diffeqgmrfs")


def select_backend(backend: str | None):
    """Pin the JAX backend. 'cpu' forces the local host (see conftest note on
    the axon plugin); None keeps the default (TPU when available)."""
    import jax

    if backend:
        jax.config.update("jax_platforms", backend)
    return jax.devices()


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--dry_run", type=lambda s: s.lower() != "false", default=None,
                   help="limit to 3 instances (reference --dry_run). Default: "
                        "true, unless an explicit --N_instances/--N_samples is "
                        "on the command line (asking for N instances and "
                        "silently running 3 is a footgun).")
    p.add_argument("--backend", type=str, default=None,
                   help="jax platform override (e.g. cpu)")
    p.add_argument("--datadir", type=str, default=None,
                   help="data root (default ./data, env DIFFEQGMRFS_DATA)")
    return p


def finalize_args(args):
    if args.datadir:
        os.environ["DIFFEQGMRFS_DATA"] = args.datadir
    if getattr(args, "dry_run", None) is None:
        # Parity default is dry_run=true (reference DrWatson convention), but
        # an explicit instance/sample count on the command line means the user
        # wants a real sweep — don't silently truncate it to 3.
        explicit_n = any(
            a.split("=")[0] in ("--N_instances", "--N_samples") for a in sys.argv[1:]
        )
        args.dry_run = not explicit_n
    return args
