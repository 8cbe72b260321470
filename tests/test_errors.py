"""Golden tests for the ScraperError Display format and kind→outcome
mappings, ported from the reference's test module
(`/root/reference/worker/src/errors.rs:237-292`). Pure-Python."""

import pytest

from scraper_ray.functions.errors import (
    ERR, REJECT, STAGE_KINDS, ArchiveError, DownloadError, ExtractError,
    ManagerError, NormaliseError, outcome_of,
)


def test_display_manager_error_no_source():
    # errors.rs:242-252
    error = ManagerError("NetworkError", "Some message", None)
    assert str(error) == "NetworkError: Some message"


def test_display_download_error_no_source():
    # errors.rs:254-264
    error = DownloadError("InvalidURL", "URL was an empty string", None)
    assert str(error) == "InvalidURL: URL was an empty string"


def test_display_extract_error_with_source():
    # errors.rs:266-276 (io::Error source renders its message)
    error = ExtractError("ParsingError", "Could not parse data",
                         OSError("Data was not found"))
    assert str(error) == ("ParsingError: Could not parse data "
                          "(source: Data was not found)")


def test_display_archive_error_with_nested_scraper_error_source():
    # errors.rs:278-292 (nested ScraperError renders its full Display)
    error = ArchiveError(
        "ServerError", "Server tried to download something and failed",
        NormaliseError("ParsingError", "Trying to test nested errors", None),
    )
    assert str(error) == (
        "ServerError: Server tried to download something and failed "
        "(source: ParsingError: Trying to test nested errors)"
    )


def test_outcome_mappings_match_reference_from_impls():
    # errors.rs:89-183: per-stage From<...> for TaskProcessResult
    assert ManagerError("NetworkError", "").outcome == REJECT
    assert ManagerError("UnreachableError", "").outcome == REJECT
    assert ManagerError("InvalidTask", "").outcome == ERR
    assert DownloadError("NetworkError", "").outcome == REJECT
    assert DownloadError("UnreachableError", "").outcome == REJECT
    assert DownloadError("InvalidURL", "").outcome == ERR
    assert DownloadError("InvalidPage", "").outcome == ERR
    assert ExtractError("ParsingError", "").outcome == ERR
    assert NormaliseError("ParsingError", "").outcome == ERR
    assert ArchiveError("NetworkError", "").outcome == REJECT
    assert ArchiveError("UnreachableError", "").outcome == REJECT
    assert ArchiveError("ServerError", "").outcome == REJECT
    assert ArchiveError("InvalidData", "").outcome == ERR


def test_invalid_kind_for_stage_rejected():
    with pytest.raises(ValueError):
        ExtractError("NetworkError", "not an extract kind")
    with pytest.raises(ValueError):
        ManagerError("InvalidURL", "that's a download kind")


def test_stage_kind_tables_complete():
    # exactly the reference's five enums (errors.rs:6-36)
    assert set(STAGE_KINDS) == {"Manager", "Download", "Extract",
                                "Normalise", "Archive"}
    assert set(STAGE_KINDS["Download"]) == {
        "NetworkError", "UnreachableError", "InvalidURL", "InvalidPage"}
    assert set(STAGE_KINDS["Archive"]) == {
        "NetworkError", "UnreachableError", "ServerError", "InvalidData"}


def test_source_sets_native_cause():
    src = OSError("disk gone")
    err = ArchiveError("InvalidData", "write failed", src)
    assert err.__cause__ is src


def test_outcome_of_flat_taxonomy_still_works():
    assert outcome_of("") == "ok"
    assert outcome_of("NetworkError") == REJECT
    assert outcome_of("RobotsDisallowed") == ERR
