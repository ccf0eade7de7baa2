"""YAML training-config tier with CLI-override precedence + provenance.

Role of reference `previous_version/Omni-Video1/finetune_model.py:87-213`:
the reference deep-merges a YAML config into its argparse namespace, then
re-serializes the merged config next to the run outputs so every training
run records exactly what it ran with. TPU-native rebuild keeps the same
contract with stricter semantics:

  precedence  CLI-explicit  >  YAML file  >  argparse defaults
  (the reference lets YAML clobber explicit CLI flags; here a flag the user
  actually typed always wins, which is what --config users expect)

  unknown YAML keys are an error (typo protection), and the merged,
  fully-resolved namespace is dumped to <output_dir>/run_config.yaml.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import Dict, Iterable, Optional


def explicit_cli_dests(parser: argparse.ArgumentParser,
                       argv: Optional[Iterable[str]] = None) -> set:
    """Dests of options the user actually typed on the command line."""
    argv = list(sys.argv[1:] if argv is None else argv)
    opt_to_dest = {}
    for action in parser._actions:
        for opt in action.option_strings:
            opt_to_dest[opt] = action.dest
    dests = set()
    for a in argv:
        if not a.startswith("-"):
            continue
        tok = a.split("=", 1)[0]
        if tok in opt_to_dest:
            dests.add(opt_to_dest[tok])
        elif tok.startswith("--"):
            # argparse accepts unambiguous long-option prefixes (`--total`
            # for --total_steps); without resolving them here a YAML value
            # would silently override a flag the user actually typed
            # (ADVICE r2)
            matches = {d for o, d in opt_to_dest.items()
                       if o.startswith("--") and o.startswith(tok)}
            if len(matches) == 1:
                dests.add(next(iter(matches)))
    return dests


def apply_yaml_config(args: argparse.Namespace,
                      parser: argparse.ArgumentParser,
                      argv: Optional[Iterable[str]] = None) -> argparse.Namespace:
    """Merge args.config (a YAML mapping) under explicitly-typed CLI flags.

    Mutates and returns `args`. No-op when --config wasn't given.
    """
    if not getattr(args, "config", None):
        return args
    import yaml

    with open(args.config) as f:
        overrides = yaml.safe_load(f) or {}
    if not isinstance(overrides, dict):
        raise SystemExit(f"--config {args.config}: expected a YAML mapping, "
                         f"got {type(overrides).__name__}")
    known = {a.dest for a in parser._actions}
    unknown = sorted(set(overrides) - known)
    if unknown:
        raise SystemExit(f"--config {args.config}: unknown keys {unknown}; "
                         f"valid keys are the CLI flag names (see --help)")
    explicit = explicit_cli_dests(parser, argv)
    for k, v in overrides.items():
        if k not in explicit:
            setattr(args, k, v)
    return args


def dump_run_config(args: argparse.Namespace, output_dir) -> Path:
    """Serialize the fully-merged namespace for run provenance.

    Matches the reference's re-serialization of its merged training config
    (finetune_model.py: config written back beside outputs).
    """
    import yaml

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    resolved: Dict = {}
    for k, v in sorted(vars(args).items()):
        if isinstance(v, Path):
            v = str(v)
        resolved[k] = v
    path = out / "run_config.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(resolved, f, sort_keys=True, default_flow_style=False)
    return path
