"""HTTP LLM clients for the explanation seam.

The reference routes by model-name substring to OpenAI / Gemini /
Anthropic — all through the OpenAI chat-completions wire format with a
provider-specific base URL (/root/reference/src/explanation_generator.py:54-68)
— plus an Ollama local path using Ollama's /api/chat
(explanation_generator.py:213-275).  This module reproduces that
routing as a factory for ``llm_fn(prompt) -> str`` callables, the
signature both `ExplanationGenerator` (driver-side) and
`BatchExplanationGenerator` (executor-side mapInPandas) accept.

stdlib-only (urllib) so the closure pickles cleanly to executors — no
client SDK import on the hot path.  Deterministic default generation
stays the template path; these clients are OPT-IN, exactly like the
reference where the LLM is behind a flag.

Error semantics mirror the reference (:92-96): a transport/API error
returns an "Error generating explanation: ..." STRING rather than
raising, so one bad call cannot fail a 10^9-row explanation stage —
callers that prefer failing fast wrap the callable.
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request
from typing import Callable, Optional

# model-name substring -> (base_url, api-key env var), reference
# explanation_generator.py:54-68. All three speak the OpenAI
# chat-completions format at their respective compatibility endpoints.
ROUTES = (
    ("gpt", "https://api.openai.com/v1/", "OPENAI_API_KEY"),
    (
        "gemini",
        "https://generativelanguage.googleapis.com/v1beta/openai/",
        "GEMINI_API_KEY",
    ),
    ("claude", "https://api.anthropic.com/v1/", "ANTHROPIC_API_KEY"),
)

OLLAMA_DEFAULT_URL = "http://localhost:11434"


def resolve_route(model_name: str) -> tuple[str, Optional[str]]:
    """(base_url, api_key_env) for a model name; unknown names fall
    through to the Ollama local route (no key), mirroring the
    reference's LocalExplanationGenerator default."""
    for sub, url, env in ROUTES:
        if sub in model_name:
            return url, env
    return OLLAMA_DEFAULT_URL, None


def _post_json(url: str, payload: dict, headers: dict, timeout: float) -> dict:
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json", **headers},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode("utf-8"))


def http_llm_fn(
    model_name: str,
    base_url: Optional[str] = None,
    api_key: Optional[str] = None,
    timeout: float = 60.0,
    api_style: Optional[str] = None,
) -> Callable[[str], str]:
    """Build an ``llm_fn(prompt) -> str`` for the routed provider.

    base_url/api_key override the route (tests point base_url at a
    local mock server). The wire protocol is ``api_style``:
    ``"openai"`` (OpenAI-style /chat/completions with a Bearer token —
    byte-compatible with the reference's
    ``openai.chat.completions.create`` usage) or ``"ollama"``
    (/api/chat with Ollama's response shape). When api_style is None it
    defaults from the ROUTE first: a routed hosted model keeps
    OpenAI-style under any base_url (a bare-host vLLM/LiteLLM gateway
    is no longer guessed into Ollama 404s); an unrouted model name
    defaults to Ollama without a base_url (the reference's local
    default) and to the /v1-URL convention with one. Pass api_style
    explicitly for the one ambiguous case — an unrouted model behind a
    bare-host OpenAI-compatible gateway.
    """
    routed_url, key_env = resolve_route(model_name)
    url = (base_url or routed_url).rstrip("/")
    key = api_key if api_key is not None else (
        os.getenv(key_env) if key_env else None
    )
    if key_env and base_url is None and not key:
        # reference raises at construction when the env var is absent
        # (explanation_generator.py:57-68)
        raise ValueError(f"{key_env} environment variable not set.")
    if api_style is None:
        # default resolution order: a routed hosted model (gpt/gemini/
        # claude) is OpenAI-style regardless of base_url (a gateway in
        # front of it stays OpenAI-compatible); an unknown model with
        # no base_url is the reference's local-Ollama default; an
        # unknown model WITH a base_url falls back to the /v1 URL
        # convention (vLLM/LiteLLM serve OpenAI-style under /v1) —
        # pass api_style explicitly for bare-host OpenAI gateways
        # serving unrouted model names.
        if base_url is not None and (
            base_url.rstrip("/") == OLLAMA_DEFAULT_URL or ":11434" in base_url
        ):
            # an explicit Ollama server address wins over the model-name
            # route: 'gpt-oss:20b' served locally is still /api/chat
            api_style = "ollama"
        elif key_env is not None:
            api_style = "openai"
        elif base_url is None:
            api_style = "ollama"
        else:
            # /v1 is the vLLM/LiteLLM OpenAI-compat convention; an
            # 'openai' host (e.g. *.openai.azure.com) is OpenAI-style
            # at any path
            api_style = (
                "openai" if ("/v1" in url or "openai" in url) else "ollama"
            )
    if api_style not in ("openai", "ollama"):
        raise ValueError(f"api_style must be 'openai' or 'ollama', got {api_style!r}")
    ollama_style = api_style == "ollama"

    def llm_fn(prompt: str) -> str:
        messages = [{"role": "user", "content": prompt}]
        try:
            if ollama_style:
                body = _post_json(
                    f"{url}/api/chat",
                    {"model": model_name, "messages": messages, "stream": False},
                    {},
                    timeout,
                )
                return body["message"]["content"].strip()
            headers = {"Authorization": f"Bearer {key}"} if key else {}
            body = _post_json(
                f"{url}/chat/completions",
                {"model": model_name, "messages": messages},
                headers,
                timeout,
            )
            return body["choices"][0]["message"]["content"].strip()
        except (
            urllib.error.URLError,
            OSError,
            KeyError,
            ValueError,
            IndexError,  # 200 with empty choices (content-filter stop)
            AttributeError,  # "content": null -> None.strip()
            TypeError,
        ) as e:
            return f"Error generating explanation: {e}"

    return llm_fn
