"""Runtime -> user presentation mapping + update state model + launch routing.

Headless re-implementations of the L7 contracts (SURVEY.md §2.2 "App shell"):
  - status/health presentation strings driving a menu/TUI
    (ref ProductSetup.swift:423-551)
  - UpdateStateModel with the benign no-update error case
    (ref UpdateManager.swift:5-49)
  - launch routing policy: login-item silent launch runs headless; a user
    open routes to setup until onboarding completes, then to settings
    (ref AppDelegate.swift:45-142, 508-707)
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional

from airwave_tpu.runtime.state import (
    AudioRuntimeState,
    CaptureAccess,
    Status,
)

_STATUS_PRESENTATION = {
    Status.UNAVAILABLE: ("No output device",
                         "Connect an output device to begin."),
    Status.INACTIVE: ("Inactive", "Rendering is stopped."),
    Status.NEEDS_PERMISSION: ("Permission needed",
                              "Grant system audio capture access."),
    Status.NATIVE_PASSTHROUGH: ("Native passthrough",
                                "Audio is playing without processing."),
    Status.STARTING: ("Starting", "Preparing the render pipeline."),
    Status.PROCESSING: ("Processing", "Spatial rendering is active."),
    Status.RECOVERING: ("Recovering", "Retrying after a pipeline issue."),
}


@dataclasses.dataclass(frozen=True)
class StatusPresentation:
    title: str
    subtitle: str
    health_lines: tuple
    severity: str  # "ok" | "warning" | "error"


def present_status(state: AudioRuntimeState) -> StatusPresentation:
    title, subtitle = _STATUS_PRESENTATION[state.status]
    health = tuple(issue.message for issue in state.health_issues)
    if state.status in (Status.NEEDS_PERMISSION, Status.UNAVAILABLE):
        severity = "error"
    elif health or state.status == Status.RECOVERING:
        severity = "warning"
    else:
        severity = "ok"
    return StatusPresentation(title, subtitle, health, severity)


def capture_guidance(state: AudioRuntimeState) -> Optional[str]:
    """Onboarding capture-card copy (ref ProductSetup.swift:204-360)."""
    if state.capture_access == CaptureAccess.DENIED:
        return ("System audio recording is disabled for this app. "
                "Enable it in your system privacy settings, then retry.")
    if state.capture_access == CaptureAccess.UNKNOWN:
        return "Airwave needs permission to capture system audio."
    if state.status == Status.RECOVERING:
        return "Capture could not be verified yet; retrying automatically."
    return None


# --- update state model ---------------------------------------------------------


class UpdatePhase(enum.Enum):
    IDLE = "idle"
    CHECKING = "checking"
    CURRENT = "current"
    AVAILABLE = "available"
    ERROR = "error"


NO_UPDATE_ERROR_CODE = 1001  # benign "no update found" completion


@dataclasses.dataclass
class UpdateStateModel:
    phase: UpdatePhase = UpdatePhase.IDLE
    version: Optional[str] = None
    message: Optional[str] = None

    def began_checking(self) -> None:
        self.phase, self.version, self.message = UpdatePhase.CHECKING, None, None

    def found(self, version: str) -> None:
        self.phase, self.version = UpdatePhase.AVAILABLE, version

    def found_no_update(self) -> None:
        self.phase, self.version = UpdatePhase.CURRENT, None

    def finished(self, error_code: Optional[int] = None,
                 message: Optional[str] = None) -> None:
        if error_code is None:
            return
        if error_code == NO_UPDATE_ERROR_CODE:
            # A normal "no update" completion arrives through the error
            # channel too (ref UpdateManager.swift:31-42).
            self.found_no_update()
        else:
            self.failed(message or f"update check failed ({error_code})")

    def failed(self, message: str) -> None:
        self.phase, self.message = UpdatePhase.ERROR, message


# --- launch routing ----------------------------------------------------------------


class LaunchReason(enum.Enum):
    LOGIN_ITEM = "loginItem"   # silent background launch
    USER_OPEN = "userOpen"     # explicit user action


class LaunchRoute(enum.Enum):
    HEADLESS = "headless"      # run the runtime, show nothing
    SETUP = "setup"            # onboarding flow
    SETTINGS = "settings"      # main surface


def route_launch(reason: LaunchReason, onboarding_complete: bool,
                 onboarding_deferred: bool) -> LaunchRoute:
    if reason == LaunchReason.LOGIN_ITEM:
        return LaunchRoute.HEADLESS
    if not onboarding_complete and not onboarding_deferred:
        return LaunchRoute.SETUP
    return LaunchRoute.SETTINGS
