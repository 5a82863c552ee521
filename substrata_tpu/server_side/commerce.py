"""Photos, chatbot configs, and parcel-purchase payment flows.

Reference models:
- Photo (server/Photo.h): a client-captured screenshot uploaded via the
  UploadPhoto connection type (Protocol: CONNECTION_TYPE_UPLOAD_PHOTO=506,
  server/WorkerThreadUploadPhotoHandling.cpp), browsable/editable on the
  website (webserver/PhotoHandlers.cpp).
- ChatBot config (server/ChatBot.h id/owner/name/pos/heading/
  custom_prompt_part/info_tool_functions; webserver/ChatBotHandlers.cpp
  edit pages).
- Parcel purchase via PayPal / Coinbase (webserver WebServerRequestHandler
  routes /buy_parcel_now_paypal, /buy_parcel_with_coinbase_post,
  /paypal_ipn, /coinbase_webhook; server/Order.h records).

The payment PROVIDERS are a seam (like the ethereum RPC seam): the wire
logic — auction price-lock, order lifecycle, webhook signature
verification (Coinbase's HMAC-SHA256 X-CC-Webhook-Signature scheme),
IPN confirmation — is real; the dev provider fabricates the remote side
deterministically so the whole flow is testable hermetically.
"""

from __future__ import annotations

import hashlib
import hmac
import json
import time
import uuid
from dataclasses import dataclass, field


# ---------------------------------------------------------------------------
# Photos (server/Photo.h)
# ---------------------------------------------------------------------------

@dataclass(eq=False)
class Photo:
    STATE_PUBLISHED = 0
    STATE_DELETED = 1
    MAX_CAPTION_SIZE = 10_000

    id: int = 0
    creator_id: int = 0
    parcel_id: int = -1
    created_time: float = field(default_factory=time.time)
    cam_pos: tuple = (0.0, 0.0, 0.0)
    cam_angles: tuple = (0.0, 0.0, 0.0)
    caption: str = ""
    flags: int = 0
    world_name: str = ""
    state: int = STATE_PUBLISHED
    # Image payloads (the reference stores files on disk at three sizes;
    # we keep bytes in the store and downscale lazily if PIL is present).
    image_data: bytes = b""
    midsize_data: bytes = b""
    thumbnail_data: bytes = b""

    def full_url(self) -> str:
        return f"/photo_image/{self.id}"

    def midsize_url(self) -> str:
        return f"/photo_midsize_image/{self.id}"

    def thumbnail_url(self) -> str:
        return f"/photo_thumb_image/{self.id}"


# ---------------------------------------------------------------------------
# ChatBot configuration (server/ChatBot.h)
# ---------------------------------------------------------------------------

@dataclass(eq=False)
class ChatBotToolFunction:
    MAX_FUNCTION_NAME_SIZE = 1_000
    MAX_DESCRIPTION_SIZE = 10_000
    MAX_RESULT_CONTENT_SIZE = 100_000

    function_name: str = ""
    description: str = ""
    result_content: str = ""


@dataclass(eq=False)
class ChatBotConfig:
    MAX_NAME_SIZE = 200
    MAX_CUSTOM_PROMPT_PART_SIZE = 10_000

    id: int = 0
    owner_id: int = 0
    created_time: float = field(default_factory=time.time)
    name: str = ""
    world_name: str = ""
    pos: tuple = (0.0, 0.0, 2.0)
    heading: float = 0.0
    custom_prompt_part: str = ""
    flags: int = 0
    # function name -> ChatBotToolFunction
    info_tool_functions: dict = field(default_factory=dict)


# ---------------------------------------------------------------------------
# Payment providers (seam)
# ---------------------------------------------------------------------------

class PaymentProvider:
    """Interface to the external payment processor.  A production
    deployment implements these against the real PayPal / Coinbase
    Commerce APIs; the webserver's flow logic is provider-agnostic."""

    # --- PayPal ---
    def paypal_checkout_url(self, order, return_url: str) -> str:
        raise NotImplementedError

    def verify_paypal_ipn(self, params: dict) -> bool:
        """IPN verification: the reference posts the IPN body back to
        PayPal and checks for VERIFIED."""
        raise NotImplementedError

    # --- Coinbase Commerce ---
    def create_coinbase_charge(self, order, redirect_url: str):
        """Returns (hosted_url, charge_code)."""
        raise NotImplementedError

    def coinbase_webhook_secret(self) -> str:
        raise NotImplementedError


def verify_coinbase_signature(body: bytes, signature_hex: str,
                              shared_secret: str) -> bool:
    """Coinbase Commerce webhook authentication: X-CC-Webhook-Signature is
    HMAC-SHA256 of the raw request body keyed by the endpoint's shared
    secret.  This check is REAL (not a stub) — it is the entire security
    of the webhook endpoint."""
    want = hmac.new(shared_secret.encode("utf-8"), body,
                    hashlib.sha256).hexdigest()
    try:
        return hmac.compare_digest(want, signature_hex)
    except TypeError:
        return False


class DevPaymentProvider(PaymentProvider):
    """Deterministic in-process provider: checkout URLs point back at the
    local order-landing page and IPN/webhook bodies it fabricates verify
    correctly, so the full purchase flow runs hermetically in tests."""

    def __init__(self, webhook_secret: str | None = None):
        self._secret = webhook_secret or uuid.uuid4().hex
        self.charges: dict[str, int] = {}   # charge code -> order id

    def paypal_checkout_url(self, order, return_url: str) -> str:
        return (f"{return_url}?order_id={order.order_id}"
                f"&provider=paypal&dev=1")

    def verify_paypal_ipn(self, params: dict) -> bool:
        # Dev stand-in for the verify-postback round trip: the IPN must
        # carry the dev shared secret.
        return params.get("dev_secret", [""])[0] == self._secret

    def ipn_params_for(self, order) -> dict:
        """Test helper: fabricate the IPN PayPal would send."""
        return {
            "txn_type": ["web_accept"],
            "payment_status": ["Completed"],
            "custom": [str(order.order_id)],
            "mc_gross": [f"{order.price:.2f}"],
            "dev_secret": [self._secret],
        }

    def create_coinbase_charge(self, order, redirect_url: str):
        code = uuid.uuid4().hex[:8].upper()
        self.charges[code] = order.order_id
        return (f"{redirect_url}?order_id={order.order_id}"
                f"&provider=coinbase&charge={code}", code)

    def coinbase_webhook_secret(self) -> str:
        return self._secret

    def webhook_body_for(self, charge_code: str) -> tuple[bytes, str]:
        """Test helper: fabricate (body, signature) of a charge:confirmed
        webhook event, signed like Coinbase Commerce signs it."""
        body = json.dumps({
            "event": {
                "type": "charge:confirmed",
                "data": {"code": charge_code},
            }
        }).encode("utf-8")
        sig = hmac.new(self._secret.encode("utf-8"), body,
                       hashlib.sha256).hexdigest()
        return body, sig
