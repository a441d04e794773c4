"""Row-local recursive dispatch engine.

Re-implements the observable semantics of the reference's FIFO dispatcher
(mwcp/dispatcher.py:139-354) as a bounded worklist that runs *inside one
Arrow batch* of the Spark ``mapInPandas`` extract stage — residual-file
recursion is row-local, so no cross-executor traffic is ever needed for it.

Semantics preserved (citations into /root/reference):
* FIFO queue; children enqueued with parent/child wiring (dispatcher.py:139-170)
* ordered first-match identification with per-(rule, md5) memoization and
  negative-caching after UnableToParse (dispatcher.py:172-202,238-239)
* description/tags/parser set before run, restored on UnableToParse
  (dispatcher.py:204-253)
* unidentified files fall back to the parent group's ordering, then the
  UnidentifiedFile default — only when no description was set
  (dispatcher.py:320-336)
* every identified file (or root-level unidentified file) with
  ``output_file=True`` is reported as a File element attributed to its
  *parent* (dispatcher.py:338-351)
* per-source metadata list dedupe on add + post_processing hooks
  (mwcp/report.py:772-791)
* per-source flatten of nested elements with order-preserving dedupe when
  emitting triples (mwcp/report.py:925-975)
"""

from __future__ import annotations

from collections import deque
from typing import Dict, Iterable, List, Optional, Tuple

from kgmwcp import canonical as md
from kgmwcp.engine.fileobj import SampleFile
from kgmwcp.engine.parsers import (
    DEFAULT_GROUP_ORDER,
    RULE_GROUPS,
    UNIDENTIFIED,
    UnableToParse,
)

__all__ = ["ExtractionEngine", "ReportContext", "ExtractionResult"]

MAX_DEPTH = 16          # recursion bound for residual-file dispatch
MAX_FILES_PER_ROOT = 256  # zip-bomb style runaway guard


class ReportContext:
    """Per-root report accumulator handed to rules.

    Mirrors the subset of mwcp.Report behavior rules rely on: element add
    with equality-dedupe + post_processing, knowledge_base, child dispatch.
    """

    def __init__(self, engine: "ExtractionEngine", knowledge_base: dict):
        self._engine = engine
        self.knowledge_base = dict(knowledge_base)
        # metadata per source file id (insertion ordered)
        self._metadata: Dict[int, List[md.Element]] = {}
        self._sources: List[SampleFile] = []
        self._current: Optional[SampleFile] = None
        self.errors: List[str] = []
        # per-file log capture (report.py:160-180 ReportLogHandler
        # analogue): (source sha256, level char, message); errors are
        # logs too, matching the reference's logs-includes-errors model
        self.logs: List[Tuple[Optional[str], str, str]] = []

    def set_file(self, f: Optional[SampleFile]) -> None:
        self._current = f
        if f is not None and id(f) not in self._metadata:
            self._metadata[id(f)] = []
            self._sources.append(f)

    def add(self, element: md.Element, source: Optional[SampleFile] = None) -> None:
        """Add element for the current (or given) source file.

        Equality-dedupe + validation-as-filter + post_processing, matching
        mwcp/report.py:772-791.
        """
        target = source if source is not None else self._current
        if target is None:
            return
        if id(target) not in self._metadata:
            self._metadata[id(target)] = []
            self._sources.append(target)
        bucket = self._metadata[id(target)]
        if element not in bucket:
            try:
                element.validate()
            except md.ValidationError as exc:
                self.log_error(str(exc))
                return
            bucket.append(element)
            element.post_processing(self)

    def dispatch(self, child: SampleFile) -> None:
        self._engine._enqueue(child, parent=self._current)

    def _log(self, level_char: str, message: str,
             source_file=None) -> None:
        src = source_file if source_file is not None else self._current
        source = src.sha256 if src is not None else None
        self.logs.append((source, level_char, message))

    def log_error(self, message: str, source_file=None) -> None:
        self.errors.append(message)
        self._log("E", message, source_file=source_file)

    def log_warning(self, message: str) -> None:
        self._log("W", message)

    def log_info(self, message: str) -> None:
        self._log("I", message)

    # -- emission ------------------------------------------------------
    def iter_triples(self) -> Iterable[Tuple[SampleFile, str, str]]:
        """(source, pred, canonical obj) with per-source flatten + dedupe.

        Matches the per-source report model built by
        Report._build_report_model -> Report.get(source=...) which flattens
        nested elements and dedupes by structural equality
        (mwcp/report.py:511-561,925-975).
        """
        for source in self._sources:
            # dedupe by canonical serialization — equivalent to the
            # reference's structural equality (payload-based) but O(n)
            # instead of O(n^2) __eq__ sweeps, and the canonical string is
            # reused as the emitted obj
            seen: set = set()
            for element in self._metadata[id(source)]:
                for item in [element, *element.sub_elements()]:
                    key = (item.type_name(), item.canonical())
                    if key not in seen:
                        seen.add(key)
                        yield source, key[0], key[1]


class ExtractionResult:
    __slots__ = ("root", "triples", "files", "errors", "logs")

    def __init__(self, root, triples, files, errors, logs=None):
        self.root = root
        self.triples = triples  # list[(source SampleFile, pred, obj)]
        self.files = files      # list[SampleFile] all processed files
        self.errors = errors
        self.logs = logs or []  # list[(source_sha256, level_char, message)]


class ExtractionEngine:
    """Runs the rule registry against one root sample (row-local)."""

    def __init__(self, group_order: Optional[List[str]] = None,
                 groups: Optional[dict] = None, greedy: bool = False):
        self.groups = groups or RULE_GROUPS
        self.group_order = group_order or DEFAULT_GROUP_ORDER
        # greedy mode: run ALL matching rules instead of first-match
        # (mwcp/dispatcher.py:97-99,311-312)
        self.greedy = greedy
        # (rule_name, md5) -> bool identify memoization; shared across roots
        # within one engine instance (i.e. one Arrow batch / python worker),
        # mirroring dispatcher._identify_cache (mwcp/dispatcher.py:51-52).
        self._identify_cache: Dict[Tuple[str, str], bool] = {}
        self._queue: deque = deque()

    # -- queue ----------------------------------------------------------
    def _enqueue(self, child: SampleFile, parent: Optional[SampleFile]) -> None:
        if child.parent is None and parent is not None:
            child.parent = parent
            child.depth = parent.depth + 1
            child.origin_group = getattr(parent, "rule_group", None)
            parent.children.append(child)
        self._queue.appendleft(child)

    # -- identification ---------------------------------------------------
    def _identify(self, rule, f: SampleFile):
        key = (rule.name(), f.md5)
        if key in self._identify_cache:
            cached = self._identify_cache[key]
            if cached is False:
                return False, ()
            # positive cache only stored for plain-bool results
            return True, ()
        ret = rule.identify(f)
        if isinstance(ret, tuple) and isinstance(ret[0], bool):
            identified, *rest = ret
            rest = tuple(rest)
        else:
            identified, rest = bool(ret), ()
        # cache plain results and negatives (dispatcher.py:197-199)
        if not rest or not identified:
            self._identify_cache[key] = bool(identified)
        return identified, rest

    def _candidate_rules(self, f: SampleFile, route: Optional[str],
                         route_scope: str = "all"):
        """Ordered (group, rule) candidates for a file.

        A child file is first offered to its origin group's rules (the
        nested-dispatcher locality of the reference), then to the rest of
        the registry order.  Explicit routing has two scopes:

        * ``"all"`` (named-parser mode, reference: running a named parser
          group) — every file in the tree is restricted to that group;
        * ``"root"`` (signature-router mode, stages/router.py) — the route
          is a *priority hint* for the root only: the routed group is
          tried first, identify() failures fall through to the normal
          registry order, and residual children re-enter auto dispatch
          (the reference re-YARAs newly surfaced unidentified files,
          mwcp/runner.py:210-214).
        """
        if route and route_scope == "all":
            order = [route]
        elif route and f.parent is None:
            order = [route] + [g for g in self.group_order if g != route]
        else:
            order = list(self.group_order)
            origin = f.origin_group
            if origin in order:
                order.remove(origin)
                order.insert(0, origin)
        for group_name in order:
            for rule in self.groups.get(group_name, ()):
                yield group_name, rule

    # -- parse ------------------------------------------------------------
    def _try_parse(self, f: SampleFile, group: str, rule, ctx: ReportContext,
                   run_args: tuple) -> bool:
        """Set file metadata, run rule; restore + negative-cache on UnableToParse."""
        orig_description = f.description
        orig_tags = set(f.tags)
        orig_rule = f.rule
        orig_rule_group = f.rule_group
        if not f.description:
            f.description = rule.DESCRIPTION
        for tag in rule.TAGS:
            f.add_tag(tag)
        f.rule = rule
        f.rule_group = group
        ctx.set_file(f)
        try:
            rule().run(f, ctx, *run_args)
            return True
        except UnableToParse:
            f.description = orig_description
            f.tags = orig_tags
            f.rule = orig_rule
            f.rule_group = orig_rule_group
            self._identify_cache[(rule.name(), f.md5)] = False
            return False
        except Exception as exc:  # parser bug: swallow into errors (dispatcher.py:254-255)
            ctx.log_error(f"{rule.name()} dispatch parser failed: {exc}")
            return True

    def run(self, data: bytes, name: Optional[str] = None,
            route: Optional[str] = None,
            knowledge_base: Optional[dict] = None,
            route_scope: str = "all") -> ExtractionResult:
        """Process one root sample to fixpoint; returns triples + file tree."""
        root = SampleFile(data, name=name, output_file=False)
        ctx = ReportContext(self, knowledge_base or {})
        ctx.set_file(root)
        self._queue.clear()
        self._queue.appendleft(root)
        processed: List[SampleFile] = []

        while self._queue and len(processed) < MAX_FILES_PER_ROOT:
            f = self._queue.pop()
            if f.depth > MAX_DEPTH:
                # attribute to the offending file, not whatever file the
                # previous parse left as _current
                ctx.log_error(f"max recursion depth exceeded at {f.name}",
                              source_file=f)
                continue
            processed.append(f)

            identified = False
            for group, rule in self._candidate_rules(f, route, route_scope):
                try:
                    ok, run_args = self._identify(rule, f)
                except Exception as exc:
                    # DEVIATION from the reference (dispatcher.py:188 is
                    # unguarded): there a crashing identify() fails one
                    # CLI run; here it would fail the Spark task and —
                    # after retries — the whole distributed job over one
                    # malformed blob. Log + treat as unidentified;
                    # negative-cached (identify is pure over the bytes).
                    ctx.log_error(f"{rule.name()} identify failed: {exc}",
                                  source_file=f)
                    self._identify_cache[(rule.name(), f.md5)] = False
                    continue
                if not ok:
                    continue
                if self._try_parse(f, group, rule, ctx, run_args):
                    identified = True
                    if not self.greedy:
                        break  # non-greedy first-match (dispatcher.py:311-312)

            if not identified and not f.description:
                # default UnidentifiedFile (dispatcher.py:329-336); a hint
                # route (scope 'root') must not relabel unidentified files
                fallback_group = route if (route and route_scope == "all") else "default"
                self._try_parse(f, fallback_group, UNIDENTIFIED, ctx, ())

            # File reporting attributed to the parent (dispatcher.py:338-351).
            # In the reference's nested setup every processed output_file=True
            # file ends up reported: identified ones by their group's loop,
            # unidentified ones by the root loop (no parent -> reports).
            if f.output_file:
                file_elem = md.FileElement(
                    name=f.name,
                    description=f.description,
                    data=f.data,
                    derivation=f.derivation,
                    architecture=f.architecture,
                    compile_time=f.compile_time,
                )
                file_elem.add_tag(*sorted(f.tags))  # File.from_file_object parity
                ctx.add(file_elem, source=f.parent)

        if self._queue:
            # like the depth guard, truncation must be visible: a report
            # with errors=[] must mean a complete extraction
            # attributed to the root (the truncation event), not whatever
            # file the last parse left as _current
            ctx.log_error(
                f"max files per root exceeded: {len(self._queue)} queued "
                f"files dropped", source_file=root)
            self._queue.clear()

        triples = list(ctx.iter_triples())
        return ExtractionResult(root=root, triples=triples, files=processed,
                                errors=ctx.errors, logs=ctx.logs)
