"""Repository-record functions — the reference's output-side semantics.

These close the loop from crawled/scanned rows to the reference's POST
payload ``repositoryRequest`` (apiclient/apiclient.go:55-65): fork
detection, private/archived skips, orgURI fallback, GitLab URL/predicate
helpers, and HTTP-header sanitation. All are pure Catalyst expressions
(codegen'd, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from don_crawler_spark.functions.extract import _GO_TRIM_RE


def fork_flag(is_fork: Column) -> Column:
    """X16 — provider fork detection is a nil-safe boolean deref:
    ``repo != nil && repo.GetFork()`` (scanner/github.go:373-375,
    scanner/gitlab.go:434-436, scanner/bitbucket.go:168-170). A missing
    repo/flag is "not a fork"."""
    return F.coalesce(is_fork.cast("boolean"), F.lit(False))


def keep_public_active(private: Column, archived: Column) -> Column:
    """F3 — skip private or archived repositories
    (scanner/github.go:198-200, scanner/bitbucket.go:57-61). Returns the
    KEEP predicate; null flags mean public/active (nil deref -> false)."""
    return ~(
        F.coalesce(private.cast("boolean"), F.lit(False))
        | F.coalesce(archived.cast("boolean"), F.lit(False))
    )


def has_default_branch(default_branch: Column) -> Column:
    """F4 — GitLab projects with an empty default branch are skipped
    (scanner/gitlab.go:406-429): the record is only emitted inside
    ``if project.DefaultBranch != ""``."""
    return F.coalesce(default_branch, F.lit("")) != ""


def is_gitlab_group(url: Column) -> Column:
    """F5 — ``isGitlabGroup`` (scanner/gitlab.go:253-261): gitlab.com is
    always a group; an on-premise URL is a group iff its path is longer
    than "/" (len(u.Path) > 1)."""
    from don_crawler_spark.functions.urls import host_col, path_col

    return (F.lower(host_col(url)) == "gitlab.com") | (
        F.length(path_col(url)) > 1
    )


def org_uri(organisation_url: Column, organization: Column) -> Column:
    """X11 — ``orgURI`` (crawler/crawler.go:740-746): the publisher's
    explicit OrganisationURL wins unless it is the EMPTY STRING (Go's
    zero value — not null!), else the Organization identifier."""
    return F.when(
        organisation_url.isNotNull() & (organisation_url != ""), organisation_url
    ).otherwise(organization)


def gitlab_raw_url(base_url: Column, default_branch: Column) -> Column:
    """X6 — ``generateGitlabRawURL`` (scanner/gitlab.go:315-324):
    path.Join(u.Path, "raw", branch, "publiccode.yml") on the project
    URL. For the well-formed absolute project URLs the scanner feeds it
    (no query/fragment), path.Join reduces to trimming trailing slashes
    and appending the three segments."""
    return F.concat(
        F.regexp_replace(base_url, "/+$", ""),
        F.lit("/raw/"),
        default_branch,
        F.lit("/publiccode.yml"),
    )


def sanitize_headers(headers: Column) -> Column:
    """F9 — drop header entries whose key trims (Go TrimSpace — Unicode
    whitespace) to "" or whose value is "" (crawler/crawler.go:355-361),
    as a MapType ``map_filter``. The one MapType operator in the survey."""
    return F.map_filter(
        headers,
        lambda k, v: (F.regexp_replace(k, _GO_TRIM_RE, "") != "") & (v != ""),
    )
