"""S12 — OAuth2 client-credentials token acquisition.

The reference fetches a bearer token once at startup and dies on failure
(cnics_to_fhir.py:199-213, E4 fail-fast). Spark shape: the token is fetched
DRIVER-SIDE before the write job and shipped to executors inside
``WriterConfig.headers`` (a broadcast-by-closure of a small tuple) — never
fetched per task, so N executors don't stampede the auth server.

Long jobs on a real cluster would refresh via a driver-side timer that
republishes the config; out of scope for parity (the reference never
refreshes either).
"""

from __future__ import annotations


class AuthError(RuntimeError):
    """Fail-fast on non-200 from the auth endpoint (cnics_to_fhir.py:211-213)."""


def fetch_client_credentials_token(
    auth_url: str, client_id: str, client_secret: str, timeout_s: float = 30.0
) -> str:
    """POST client-credentials grant → access token string."""
    import requests

    resp = requests.post(
        auth_url,
        data={
            "grant_type": "client_credentials",
            "client_id": client_id,
            "client_secret": client_secret,
        },
        timeout=timeout_s,
    )
    if resp.status_code != 200:
        raise AuthError(f"auth endpoint returned {resp.status_code}: {resp.text[:200]}")
    token = resp.json().get("access_token")
    if not token:
        raise AuthError("auth endpoint returned no access_token")
    return token


def bearer_headers(token: str) -> tuple[tuple[str, str], ...]:
    """WriterConfig.headers form."""
    return (("Authorization", f"Bearer {token}"),)
