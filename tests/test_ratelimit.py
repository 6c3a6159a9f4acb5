"""Rate-limit header parsing (A9/X9) — mirrors the reference's
table-driven suite at common/rate_limit_headers_test.go:10-164."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from don_crawler_spark.functions.ratelimit import (
    MAX_RETRY_AFTER_SECONDS,
    rate_limit_reset_from_headers,
    retry_after_reset,
)

NOW = datetime(2026, 8, 16, 12, 0, 0, tzinfo=timezone.utc)


def _epoch(dt: datetime) -> str:
    return str(int(dt.timestamp()))


def test_nil_headers() -> None:
    assert rate_limit_reset_from_headers(None, NOW) is None


def test_empty_headers() -> None:
    assert rate_limit_reset_from_headers({}, NOW) is None


def test_ratelimit_reset_epoch() -> None:
    reset = NOW + timedelta(minutes=10)
    got = rate_limit_reset_from_headers({"RateLimit-Reset": [_epoch(reset)]}, NOW)
    assert got == reset.replace(microsecond=0)


def test_x_ratelimit_reset_epoch() -> None:
    reset = NOW + timedelta(hours=1)
    got = rate_limit_reset_from_headers({"X-RateLimit-Reset": [_epoch(reset)]}, NOW)
    assert got == reset.replace(microsecond=0)


def test_multi_value_uses_latest() -> None:
    early = NOW + timedelta(minutes=5)
    late = NOW + timedelta(minutes=30)
    got = rate_limit_reset_from_headers(
        {"RateLimit-Reset": [_epoch(early), _epoch(late)]}, NOW
    )
    assert got == late.replace(microsecond=0)


def test_comma_separated_uses_latest() -> None:
    early = NOW + timedelta(minutes=5)
    late = NOW + timedelta(minutes=30)
    got = rate_limit_reset_from_headers(
        {"RateLimit-Reset": [f"{_epoch(late)}, {_epoch(early)}"]}, NOW
    )
    assert got == late.replace(microsecond=0)


def test_both_header_kinds_latest_wins() -> None:
    a = NOW + timedelta(minutes=10)
    b = NOW + timedelta(minutes=40)
    got = rate_limit_reset_from_headers(
        {"RateLimit-Reset": [_epoch(a)], "X-RateLimit-Reset": [_epoch(b)]}, NOW
    )
    assert got == b.replace(microsecond=0)


def test_retry_after_seconds() -> None:
    got = rate_limit_reset_from_headers({"Retry-After": ["120"]}, NOW)
    assert got == NOW + timedelta(seconds=120)


def test_retry_after_http_date() -> None:
    when = NOW + timedelta(hours=2)
    http_date = when.strftime("%a, %d %b %Y %H:%M:%S GMT")
    got = rate_limit_reset_from_headers({"Retry-After": [http_date]}, NOW)
    assert got == when.replace(microsecond=0)


def test_retry_after_negative_ignored() -> None:
    assert rate_limit_reset_from_headers({"Retry-After": ["-5"]}, NOW) is None
    assert rate_limit_reset_from_headers({"Retry-After": ["0"]}, NOW) is None


def test_retry_after_too_large_ignored() -> None:
    too_big = str(MAX_RETRY_AFTER_SECONDS + 1)
    assert rate_limit_reset_from_headers({"Retry-After": [too_big]}, NOW) is None
    # exactly at the cap is accepted
    got = rate_limit_reset_from_headers(
        {"Retry-After": [str(MAX_RETRY_AFTER_SECONDS)]}, NOW
    )
    assert got == NOW + timedelta(seconds=MAX_RETRY_AFTER_SECONDS)


def test_far_future_reset_ignored() -> None:
    far = NOW + timedelta(hours=25)
    assert rate_limit_reset_from_headers({"RateLimit-Reset": [_epoch(far)]}, NOW) is None


def test_invalid_values_ignored() -> None:
    assert rate_limit_reset_from_headers({"RateLimit-Reset": ["soon"]}, NOW) is None
    assert rate_limit_reset_from_headers({"Retry-After": ["whenever"]}, NOW) is None
    assert rate_limit_reset_from_headers({"RateLimit-Reset": ["", "  "]}, NOW) is None


def test_past_reset_still_considered() -> None:
    # The Go code only bounds the future side; a past instant is accepted.
    past = NOW - timedelta(minutes=5)
    got = rate_limit_reset_from_headers({"RateLimit-Reset": [_epoch(past)]}, NOW)
    assert got == past.replace(microsecond=0)


def test_retry_after_reset_direct() -> None:
    assert retry_after_reset("", NOW) is None
    assert retry_after_reset("  ", NOW) is None
    assert retry_after_reset("60", NOW) == NOW + timedelta(seconds=60)
