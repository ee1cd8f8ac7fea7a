#!/usr/bin/env python
"""Release version gate (the framework's analog of
/root/reference/scripts/validate-release-version.sh +
verify-2.0-metadata.sh).

Checks, in order:
  1. `version` is semantic X.Y.Z with components 0..999 and is not 0.0.0.
  2. It is strictly greater than `latest` (the newest existing v-tag), when
     one exists.
  3. It matches the version declared in pyproject.toml (the package
     metadata users actually install) unless --skip-metadata.

On success prints GitHub-output style lines:
    VERSION=X.Y.Z
    BUILD_NUMBER=N        (major*1e6 + minor*1e3 + patch — monotonic)
    TAG=vX.Y.Z
On failure prints the reason to stderr and exits 1.

Usage: validate_release_version.py VERSION [LATEST_TAG] [--skip-metadata]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

_SEMVER = re.compile(r"^(0|[1-9][0-9]{0,2})\.(0|[1-9][0-9]{0,2})\.(0|[1-9][0-9]{0,2})$")


class ReleaseGateError(ValueError):
    pass


def build_number(version: str) -> int:
    m = _SEMVER.match(version)
    if not m:
        raise ReleaseGateError(
            f"version must be X.Y.Z with components 0 through 999, got "
            f"{version!r}"
        )
    major, minor, patch = (int(g) for g in m.groups())
    return major * 1_000_000 + minor * 1_000 + patch


def pyproject_version(pyproject_path: str | Path) -> str:
    text = Path(pyproject_path).read_text(encoding="utf-8")
    m = re.search(r'^version\s*=\s*"([^"]+)"', text, re.MULTILINE)
    if not m:
        raise ReleaseGateError(f"no version field found in {pyproject_path}")
    return m.group(1)


def validate(version: str, latest_tag: str = "",
             pyproject_path: str | Path | None = None) -> dict:
    number = build_number(version)
    if number == 0:
        raise ReleaseGateError("version 0.0.0 cannot be released")
    if latest_tag:
        latest = latest_tag[1:] if latest_tag.startswith("v") else latest_tag
        try:
            latest_number = build_number(latest)
        except ReleaseGateError:
            raise ReleaseGateError(
                f"latest tag is not semantic: {latest_tag!r}"
            ) from None
        if number <= latest_number:
            raise ReleaseGateError(
                f"{version} must be greater than the latest release {latest}"
            )
    if pyproject_path is not None:
        declared = pyproject_version(pyproject_path)
        if declared != version:
            raise ReleaseGateError(
                f"pyproject.toml declares version {declared}, release asks "
                f"for {version} — bump the package metadata first"
            )
    return {"VERSION": version, "BUILD_NUMBER": number, "TAG": f"v{version}"}


def main(argv: list[str]) -> int:
    args = [a for a in argv if a != "--skip-metadata"]
    skip_metadata = "--skip-metadata" in argv
    if not args:
        print(__doc__, file=sys.stderr)
        return 1
    version = args[0]
    latest = args[1] if len(args) > 1 else ""
    pyproject = (None if skip_metadata
                 else Path(__file__).resolve().parent.parent / "pyproject.toml")
    try:
        outputs = validate(version, latest, pyproject)
    except ReleaseGateError as err:
        print(f"release validation failed: {err}", file=sys.stderr)
        return 1
    for key, value in outputs.items():
        print(f"{key}={value}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
