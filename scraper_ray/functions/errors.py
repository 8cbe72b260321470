"""Error taxonomy with the reference's kind→outcome mapping.

The reference defines five error-kind enums (Manager / Download / Extract /
Normalise / Archive, `/root/reference/worker/src/errors.rs:6-62`) and maps
each kind to a task outcome (`errors.rs:89-183`):

- network / unreachable / server errors → ``Reject`` (intended requeue — but
  the reference passes ``requeue:false`` so the task is in fact dropped,
  `rmqredis.rs:230-251`);
- invalid task / URL / page / data, parse errors → ``Err`` (discard).

Our engine reproduces the *actual* behaviour: every terminal error becomes a
row in the ``errors`` output table carrying ``error_kind``; transient
infrastructure failures are instead retried by Ray (task ``max_retries`` /
actor restart), which is the non-bugged version of ``Reject``.
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
