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
    url: str | None = None,
    timeout_s: float = 10.0,
    retries: int = 5,
    poster: Callable | None = None,
    *,
    error_url: str | None = None,
    pre_backup_url: str | None = None,
    post_backup_url: str | None = None,
) -> Hook:
    """POST {"status": action} with the reference's per-action routing
    (hooks/00-webhook:6-63):

    - ``pre-backup`` → ``pre_backup_url`` (WEBHOOK_PRE_BACKUP_URL);
    - ``post-backup`` → ``url`` then ``post_backup_url``
      (WEBHOOK_URL + WEBHOOK_POST_BACKUP_URL — both fire when set);
    - ``error`` → ``url`` then ``error_url``
      (WEBHOOK_URL + WEBHOOK_ERROR_URL).

    Unset URLs are skipped (the reference's ``**None**`` guard).
    Delivery bounds per curl: 10 s max, ``--retry 5`` = one initial
    attempt plus 5 retries = 6 total attempts per URL.
    """

    def _default_poster(u: str, body: bytes):
        req = urllib.request.Request(
            u, data=body, headers={"Content-Type": "application/json"}
        )
        urllib.request.urlopen(req, timeout=timeout_s)

    post = poster or _default_poster
    routes: dict[str, tuple[str | None, ...]] = {
        "pre-backup": (pre_backup_url,),
        "post-backup": (url, post_backup_url),
        "error": (url, error_url),
    }

    def hook(action: str) -> None:
        body = json.dumps({"status": action}).encode()
        for u in routes.get(action, ()):
            if u is None:
                continue
            last = None
            for _ in range(retries + 1):  # curl --retry N = N+1 attempts
                try:
                    post(u, body)
                    last = None
                    break
                except Exception as e:
                    last = e
            if last is not None:
                raise HookError(
                    f"webhook delivery to {u} failed after {retries + 1} "
                    f"attempts: {last}"
                )

    return hook
