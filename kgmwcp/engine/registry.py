"""External rule-source registration — "add my own parser without forking".

Three source kinds, mirroring the reference (``mwcp/registry.py``):
one-off directories (``register_parser_directory`` :171-198, CLI
``--parser-dir``), installed python packages (``register_parser_package``
:199-227 — the primary distribution channel for parser collections), and
entry-point auto-discovery (``register_entry_points`` :131-141, group
``mwcp.parsers`` — ours is ``kgmwcp.parsers``).

Re-expressed for the Spark execution model: the DRIVER registers a directory so
``--list`` / auto-routing / ``--serve`` see the new groups, and the
extract stage re-registers the same directories INSIDE the mapInArrow
worker before building its ExtractionEngine — the
``multi_proc.initializer`` analogue (``mwcp/utils/multi_proc.py:15-18``)
SURVEY §3 names, since executor processes never inherit driver-side
module state.  The directory must therefore be visible on every
executor (shared filesystem or ``spark-submit --files``), exactly like
the reference's note that parser packages "must be discoverable in
subprocesses" (``mwcp/registry.py:205-208``).

A rule module is any non-``_``-prefixed ``*.py`` file in the directory.
Every ``Rule`` subclass DEFINED in the module (imported ones are
skipped) is collected in definition order; the module's rules join the
group named by a module-level ``GROUP`` attribute, or the file stem.
Joining an existing group appends after the built-ins (the reference
composes named groups the same additive way,
``mwcp/registry.py:316-367``); a NEW group is prepended to the
auto-routing order — a user registering a bespoke parser wants it tried
before the generic built-in fallbacks (the reference has no auto-order
to extend: you name the parser or use YARA, ``mwcp/core.py:16-84``).

Registration is idempotent per directory realpath, so the driver and
every executor partition may call :func:`ensure_registered` freely.
"""

from __future__ import annotations

import hashlib
import importlib
import importlib.util
import os
import pkgutil
import sys
from typing import Dict, Iterable, List, Optional, Tuple

from kgmwcp.engine.parsers import DEFAULT_GROUP_ORDER, RULE_GROUPS, Rule

__all__ = ["register_rule_directory", "register_rule_package",
           "register_entry_points", "entry_point_packages",
           "ensure_registered", "registered_sources"]

# the installed-package analogue of the reference's "mwcp.parsers"
# entry-point group (mwcp/registry.py:131-141): a parser collection
# declares `[project.entry-points."kgmwcp.parsers"] name = "pkg"` and
# is auto-discovered by register_entry_points()
ENTRY_POINT_GROUP = "kgmwcp.parsers"

# source key (dir realpath / "pkg:<name>") -> (source_name, groups)
_LOADED: Dict[str, Tuple[str, List[str]]] = {}


def _merge_staged(staged: List[Tuple[str, List[type]]]) -> List[str]:
    """Phase 2 of every source loader: fold staged (group, rules) into
    the live registries.  Joining an existing group appends after the
    built-ins; a NEW group is prepended to the auto-routing order (a
    bespoke parser is tried before the generic fallbacks)."""
    groups: List[str] = []
    for group, rules in staged:
        if group in RULE_GROUPS:
            known = set(RULE_GROUPS[group])
            RULE_GROUPS[group] = RULE_GROUPS[group] + [
                r for r in rules if r not in known]
        else:
            RULE_GROUPS[group] = list(rules)
            # in-place: dispatcher/engine modules hold THIS list object
            DEFAULT_GROUP_ORDER.insert(0, group)
        if group not in groups:
            groups.append(group)
    return groups


def _rules_defined_in(mod, mod_name: str) -> List[type]:
    return [
        v for v in vars(mod).values()
        if isinstance(v, type) and issubclass(v, Rule)
        and v is not Rule and v.__module__ == mod_name
    ]


def register_rule_directory(directory: str,
                            source_name: Optional[str] = None) -> List[str]:
    """Load every rule module in ``directory`` into the group registry.

    Returns the group names the directory contributed (possibly empty).
    Idempotent: re-registering the same realpath returns the original
    contribution without re-importing.
    """
    real = os.path.realpath(directory)
    if not os.path.isdir(real):
        # reference error string, mwcp/registry.py:185-186
        raise ValueError(
            f"Parser directory not found or not a directory: {directory}")
    if real in _LOADED:
        return list(_LOADED[real][1])
    source = source_name or real
    # namespace module names by directory hash like the reference's
    # _create_package (mwcp/registry.py:231-236) so two sources may both
    # ship a module called e.g. rules.py
    ns = hashlib.md5(real.encode("utf-8")).hexdigest()[:12]
    # TWO-PHASE: import every module first, then mutate the registries.
    # A mid-directory import failure (transient IO, syntax error in one
    # module) must leave RULE_GROUPS untouched — otherwise a same-process
    # retry (Spark re-running a failed task in a reused python worker)
    # re-imports the earlier modules as fresh class objects and appends
    # duplicate rules (review finding).
    staged: List[Tuple[str, List[type]]] = []
    loaded_mods: List[str] = []
    try:
        for fname in sorted(os.listdir(real)):
            if not fname.endswith(".py") or fname.startswith("_"):
                continue
            stem = fname[:-3]
            mod_name = f"kgmwcp_rules_{ns}_{stem}"
            spec = importlib.util.spec_from_file_location(
                mod_name, os.path.join(real, fname))
            mod = importlib.util.module_from_spec(spec)
            sys.modules[mod_name] = mod
            loaded_mods.append(mod_name)
            spec.loader.exec_module(mod)
            rules = [
                v for v in vars(mod).values()
                if isinstance(v, type) and issubclass(v, Rule)
                and v is not Rule and v.__module__ == mod_name
            ]
            if rules:
                staged.append((getattr(mod, "GROUP", None) or stem, rules))
    except Exception:
        for mod_name in loaded_mods:
            sys.modules.pop(mod_name, None)
        raise
    groups = _merge_staged(staged)
    _LOADED[real] = (source, groups)
    return groups


def register_rule_package(package, source_name: Optional[str] = None
                          ) -> List[str]:
    """Load every rule module in an INSTALLED python package — the
    reference's primary distribution channel for parser collections
    (``mwcp/registry.py:199-227`` ``register_parser_package``; pip-
    installable packages exposing submodules of parsers).

    ``package`` is a package object or an importable dotted name.  Like
    the reference's note (mwcp/registry.py:205-208), the package must be
    importable WITHOUT path modification in every worker process — i.e.
    pip-installed on the executors — which is exactly what makes the
    executor-side re-registration a plain import by name.

    Same module semantics as the directory source: every non-``_``
    submodule is imported, Rule subclasses DEFINED in it (imported ones
    skipped) join the group named by a module-level ``GROUP`` or the
    module stem.  Two-phase and idempotent per package name.
    """
    if isinstance(package, str):
        package = importlib.import_module(package)
    if not hasattr(package, "__path__"):
        # reference error string, mwcp/registry.py:216-217
        raise ValueError(f"{package!r} is not a Python package")
    key = f"pkg:{package.__name__}"
    if key in _LOADED:
        return list(_LOADED[key][1])
    source = source_name or package.__name__.lower()
    # TWO-PHASE like the directory path: import everything, then mutate
    staged: List[Tuple[str, List[type]]] = []
    for info in sorted(pkgutil.iter_modules(package.__path__),
                       key=lambda i: i.name):
        if info.name.startswith("_") or info.ispkg:
            continue
        mod_name = f"{package.__name__}.{info.name}"
        mod = importlib.import_module(mod_name)
        rules = _rules_defined_in(mod, mod_name)
        if rules:
            staged.append((getattr(mod, "GROUP", None) or info.name, rules))
    groups = _merge_staged(staged)
    _LOADED[key] = (source, groups)
    return groups


def register_entry_points(group: str = ENTRY_POINT_GROUP) -> List[str]:
    """Auto-discover parser packages advertised via entry points — the
    reference's ``register_entry_points`` (mwcp/registry.py:131-141,
    entry-point group "mwcp.parsers" declared in a collection's
    setup.py).  Each entry point loads to a package which is registered
    under the entry-point's name.  Returns all contributed groups."""
    from importlib import metadata

    groups: List[str] = []
    for entry in metadata.entry_points(group=group):
        groups.extend(register_rule_package(entry.load(),
                                            source_name=entry.name))
    return groups


def entry_point_packages(group: str = ENTRY_POINT_GROUP) -> List[str]:
    """Dotted package names advertised in the entry-point group, WITHOUT
    importing them (entry.value is the target module path) — so the CLI
    can fold them into config.rule_packages for executor-side
    re-registration by name."""
    from importlib import metadata

    return [entry.value.split(":")[0]
            for entry in metadata.entry_points(group=group)]


def ensure_registered(rule_dirs: Iterable[str],
                      rule_packages: Iterable[str] = ()) -> None:
    """Executor-side (and re-entrant driver-side) entry point: register
    each directory / installed package exactly once per python process."""
    for d in rule_dirs or ():
        register_rule_directory(d)
    for p in rule_packages or ():
        register_rule_package(p)


def registered_sources() -> Dict[str, List[str]]:
    """source name -> contributed groups (for --list / diagnostics)."""
    return {src: list(groups) for src, groups in _LOADED.values()}


def rule_source(rule: type, group: str) -> str:
    """Source attribution for a rule: 'kgmwcp' for built-ins (real
    ``kgmwcp.*`` modules — external modules are namespaced
    ``kgmwcp_rules_<hash>_*`` and must NOT match), else the registered
    source that contributed the group.  The ONE definition shared by
    `--list` and the server's /descriptions (review finding: two
    hand-copied versions would drift on the namespacing convention)."""
    if rule.__module__.startswith("kgmwcp."):
        return "kgmwcp"
    for src, groups in _LOADED.values():
        if group in groups:
            return src
    return "external"
