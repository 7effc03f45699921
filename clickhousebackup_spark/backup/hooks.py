"""Lifecycle hooks + webhook notifier (A5/A6/A20).

Reference semantics reproduced exactly:

- pre-backup hooks run in registration order and abort the job on the
  first failure (`run-parts --exit-on-error -a pre-backup`,
  backup.sh:16-18);
- post-backup hooks run in *reverse* registration order
  (`run-parts --reverse`, backup.sh:127-130);
- any error during the run fires error hooks once (`trap on_error
  ERR`, backup.sh:5-11);
- the stock webhook hook POSTs `{"status": …}` with a 10 s timeout
  and 5 retries (`hooks/00-webhook:14-15`), gated behind an import-try
  since `requests` may be absent.
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Callable
from dataclasses import dataclass, field

Hook = Callable[[str], None]  # receives the action name, like argv[1]


class HookError(RuntimeError):
    pass


@dataclass
class LifecycleHooks:
    _hooks: list[Hook] = field(default_factory=list)

    def add(self, hook: Hook) -> "LifecycleHooks":
        self._hooks.append(hook)
        return self

    def fire(self, action: str, reverse: bool = False, exit_on_error: bool = True):
        hooks = list(reversed(self._hooks)) if reverse else list(self._hooks)
        for h in hooks:
            try:
                h(action)
            except Exception as e:
                if exit_on_error:
                    raise HookError(f"hook failed during {action}: {e}") from e

    def run_job(self, job: Callable[[], object]) -> object:
        """backup.sh's lifecycle: pre (exit-on-error) → job → post
        (reverse, exit-on-error); errors anywhere fire error hooks."""
        try:
            self.fire("pre-backup")
            result = job()
            self.fire("post-backup", reverse=True)
            return result
        except Exception:
            # trap on_error ERR (backup.sh:5-11): never exit-on-error
            self.fire("error", exit_on_error=False)
            raise


def webhook_hook(
    url: str,
    timeout_s: float = 10.0,
    retries: int = 5,
    poster: Callable | None = None,
) -> Hook:
    """POST {"status": action} per hooks/00-webhook:13,37,50 with the
    reference's delivery bounds (10 s max, 5 retries)."""

    def _default_poster(u: str, body: bytes):
        req = urllib.request.Request(
            u, data=body, headers={"Content-Type": "application/json"}
        )
        urllib.request.urlopen(req, timeout=timeout_s)

    post = poster or _default_poster

    def hook(action: str) -> None:
        body = json.dumps({"status": action}).encode()
        last = None
        for _ in range(retries):
            try:
                post(url, body)
                return
            except Exception as e:  # curl --retry 5
                last = e
        raise HookError(f"webhook delivery failed after {retries} tries: {last}")

    return hook
