"""Error taxonomy with the reference's kind→outcome mapping.

The reference defines five error-kind enums (Manager / Download / Extract /
Normalise / Archive, `/root/reference/worker/src/errors.rs:6-62`) and maps
each kind to a task outcome (`errors.rs:89-183`):

- network / unreachable / server errors → ``Reject`` (intended requeue — but
  the reference passes ``requeue:false`` so the task is in fact dropped,
  `rmqredis.rs:230-251`);
- invalid task / URL / page / data, parse errors → ``Err`` (discard).

Our engine reproduces the *actual* behaviour by default: every terminal error
becomes a row in the ``errors`` output table carrying ``error_kind``.
``CrawlConfig.retry_limit > 0`` instead enables the reference's *intent*:
kinds in :data:`TRANSIENT_KINDS` requeue into the frontier with a bounded
per-URL retry count (see ``state.shard.StateShard.reinsert``). Transient
infrastructure failures inside Ray itself are additionally retried by Ray
(task ``max_retries`` / actor restart).
"""

from __future__ import annotations

# outcome constants (traits.rs:26-34's three-valued TaskProcessResult)
OK = "ok"
ERR = "err"  # discard, record in errors table
REJECT = "reject"  # transient — retried by Ray, recorded only if exhausted

#: error_kind → (reference enum, reference outcome, our handling)
CLASSIFICATION: dict[str, tuple[str, str, str]] = {
    # download stage (errors.rs DownloadErrorKind)
    "NetworkError": ("Download::NetworkError", REJECT,
                     "errors-table row (reference's requeue flag is bugged "
                     "to false, so the observable behaviour is a drop)"),
    "UnreachableError": ("Download::UnreachableError", REJECT, "errors-table row"),
    "ServerError": ("Download::ServerError", REJECT, "errors-table row"),
    "InvalidPage": ("Download::InvalidPage", ERR, "errors-table row"),
    # manager stage (ManagerErrorKind)
    "InvalidTask": ("Manager::InvalidTask", ERR,
                    "dropped at canonicalization (Task::deserialise parity)"),
    # extract stage (ExtractErrorKind)
    "ParsingError": ("Extract::ParsingError", ERR,
                     "unparseable hrefs dropped silently (filter_map parity)"),
    # normalise stage (NormaliseErrorKind)
    "NormaliseError": ("Normalise::ParsingError", ERR,
                       "invalid URLs dropped by canonicalize()"),
    # archive stage (ArchiveErrorKind)
    "ArchiveError": ("Archive::*", ERR, "write retried then errors-table row"),
    # engine extensions (no reference counterpart)
    "RobotsDisallowed": ("—", ERR, "politeness extension: recorded, not fetched"),
    "DecodeError": ("—", ERR, "payload failed the per-row decode invariant"),
}


def outcome_of(error_kind: str) -> str:
    """Reference outcome for an error kind ('' → OK)."""
    if not error_kind:
        return OK
    return CLASSIFICATION.get(error_kind, ("?", ERR, ""))[1]


#: kinds the reference maps to Reject (= intended requeue, errors.rs:89-183).
#: With ``CrawlConfig.retry_limit > 0`` the engine requeues these rows into
#: their host shard's frontier up to the limit (the non-bugged Reject);
#: with the default 0 it reproduces the reference's actual drop behaviour.
TRANSIENT_KINDS = frozenset(
    k for k, (_, outcome, _) in CLASSIFICATION.items() if outcome == REJECT
)


# ---------------------------------------------------------------------------
# ScraperError hierarchy: the reference's per-stage error structs with
# source-chaining and Display parity (`errors.rs:39-47,186-233`). The five
# stage enums and their kind→outcome From<> impls (`errors.rs:89-183`):

#: stage → {kind: outcome}
STAGE_KINDS: dict[str, dict[str, str]] = {
    "Manager": {"NetworkError": REJECT, "UnreachableError": REJECT,
                "InvalidTask": ERR},
    "Download": {"NetworkError": REJECT, "UnreachableError": REJECT,
                 "InvalidURL": ERR, "InvalidPage": ERR},
    "Extract": {"ParsingError": ERR},
    "Normalise": {"ParsingError": ERR},
    "Archive": {"NetworkError": REJECT, "UnreachableError": REJECT,
                "ServerError": REJECT, "InvalidData": ERR},
}


class ScraperError(Exception):
    """Base error: kind + message + optional source, formatted exactly as the
    reference's ``Display`` impl (`errors.rs:186-204`):

    - without source: ``"NetworkError: No internet"``
    - with source: ``"ParsingError: Failed to parse (source: No header)"``

    ``source`` may be any exception (nested ScraperErrors render their own
    Display recursively, matching the Rust nested-error test at
    `errors.rs:276-291`).
    """

    stage: str | None = None

    def __init__(self, kind: str, msg: str, source: Exception | None = None):
        if self.stage is not None and kind not in STAGE_KINDS[self.stage]:
            raise ValueError(f"{kind!r} is not a {self.stage} error kind")
        self.kind = kind
        self.msg = msg
        self.source = source
        super().__init__(self._display())
        if source is not None:
            self.__cause__ = source  # native chaining alongside Display parity

    def _display(self) -> str:
        src = f" (source: {self.source})" if self.source is not None else ""
        return f"{self.kind}: {self.msg}{src}"

    def __str__(self) -> str:
        return self._display()

    @property
    def outcome(self) -> str:
        """Three-valued TaskProcessResult for this error (traits.rs:26-34)."""
        if self.stage is not None:
            return STAGE_KINDS[self.stage][self.kind]
        return outcome_of(self.kind)


class ManagerError(ScraperError):
    stage = "Manager"


class DownloadError(ScraperError):
    stage = "Download"


class ExtractError(ScraperError):
    stage = "Extract"


class NormaliseError(ScraperError):
    stage = "Normalise"


class ArchiveError(ScraperError):
    stage = "Archive"
