"""Minimal OpenAI-compatible HTTP client (Chat Completions + Responses).

The reference links async-openai (Cargo.toml:45); here the two endpoints the
agent needs are called directly over httpx — no SDK dependency, and a
``base_url`` override points at any OpenAI-compatible server (the
reference exposes the same knob, src/cmds/ask.rs:75-79), which is also how
the hermetic tests inject a fake LLM.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import httpx

DEFAULT_BASE_URL = "https://api.openai.com/v1"


class OpenAIClient:
    def __init__(
        self,
        api_key: str,
        base_url: Optional[str] = None,
        http: Optional[httpx.Client] = None,
    ):
        self.base_url = (base_url or DEFAULT_BASE_URL).rstrip("/")
        self._http = http or httpx.Client(timeout=httpx.Timeout(300.0))
        self._headers = {
            "Authorization": f"Bearer {api_key}",
            "Content-Type": "application/json",
        }

    def _post(self, path: str, payload: Dict) -> Dict:
        resp = self._http.post(
            f"{self.base_url}{path}", headers=self._headers, json=payload
        )
        if resp.is_error:
            raise RuntimeError(f"LLM API error {resp.status_code}: {resp.text}")
        return resp.json()

    # -- Chat Completions API ---------------------------------------------

    def chat_completion(
        self,
        model: str,
        messages: List[Dict],
        tools: Optional[List[Dict]] = None,
    ) -> Dict:
        """Returns the first choice's message dict."""
        payload: Dict = {"model": model, "messages": messages}
        if tools:
            payload["tools"] = tools
        data = self._post("/chat/completions", payload)
        choices = data.get("choices") or []
        if not choices:
            raise RuntimeError("No choices in response")
        return choices[0]["message"]

    # -- Responses API -----------------------------------------------------

    def responses_create(
        self,
        model: str,
        input_items: List[Dict],
        instructions: str,
        tools: Optional[List[Dict]] = None,
        max_output_tokens: int = 4096,
    ) -> Dict:
        """Returns the raw response body (caller walks ``output``)."""
        payload: Dict = {
            "model": model,
            "input": input_items,
            "instructions": instructions,
            "max_output_tokens": max_output_tokens,
            "store": False,
        }
        if tools:
            payload["tools"] = tools
        return self._post("/responses", payload)


def response_output_text(response: Dict) -> Optional[str]:
    """Concatenate output_text parts of a Responses API result."""
    parts: List[str] = []
    for item in response.get("output", []):
        if item.get("type") == "message":
            for piece in item.get("content", []):
                if piece.get("type") == "output_text":
                    parts.append(piece.get("text", ""))
    return "".join(parts) if parts else None
