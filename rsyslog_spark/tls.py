"""TLS transport security for the syslog sockets — the reference's
network-stream-driver TLS layer (gtls/ossl) re-expressed over Python's
stdlib ``ssl``.

Reference semantics implemented here:

* auth modes ``anon`` / ``x509/certvalid`` / ``x509/fingerprint`` /
  ``x509/name`` (runtime/nsd_ossl.c:638-667 SetAuthMode);
* fingerprint strings formatted exactly like
  net_ossl_genfingerprintstr (runtime/net_ossl.c:818-843):
  ``SHA1`` or ``SHA256`` prefix then ``:%02X`` per digest byte, and a
  permitted-peer entry may pin either digest
  (net_ossl_peerfingerprint, net_ossl.c:1110-1170);
* peer-name authorization walks the full subject oneline, then every
  SAN dNSName/iPAddress, then falls back to the subject CN only when
  nothing matched and (PrioritizeSAN is off OR the cert has no SAN)
  (net_ossl_chkpeername, net_ossl.c:1191-1235; net_ossl_match_sans
  :1001-1075 — *any* SAN sets bHaveSAN, not just DNS ones);
* permitted-peer wildcards are matched component-by-component against
  the dot-split name — ``*`` (whole component), ``*suffix``,
  ``prefix*``, empty component — and the component COUNTS must match:
  ``*.example.net`` does NOT match ``a.b.example.net``
  (PermittedPeerWildcardMatch, runtime/net.c:356-470).

Documented divergence: the reference's ``x509/fingerprint`` mode
accepts certificates without chain validation (the pin replaces PKI).
stdlib ``ssl`` cannot request-but-not-verify a peer certificate, so
every non-anon mode here verifies the chain against ``ca_file`` first;
the fingerprint/name check is an authorization layer on top. For the
classic self-signed-pinning deployment, point ``ca_file`` at the peer
certificate itself — a self-signed certificate is its own root.
"""

from __future__ import annotations

import hashlib
import ssl
from dataclasses import dataclass, field

AUTH_MODES = ("anon", "x509/certvalid", "x509/fingerprint", "x509/name")

# getpeercert() subject key → OpenSSL short name, for the
# X509_NAME_oneline-style identity that chkpeername tries first.
_ONELINE_KEYS = {
    "countryName": "C",
    "stateOrProvinceName": "ST",
    "localityName": "L",
    "organizationName": "O",
    "organizationalUnitName": "OU",
    "commonName": "CN",
    "emailAddress": "emailAddress",
}


@dataclass(frozen=True)
class TlsConfig:
    """One side's stream-driver TLS settings (cert/key/ca =
    DefaultNetstreamDriver{CertFile,KeyFile,CAFile}; auth_mode =
    StreamDriverAuthMode; permitted_peers = StreamDriverPermittedPeers;
    prioritize_san = PrioritizeSAN)."""

    cert_file: str
    key_file: str
    ca_file: str | None = None
    auth_mode: str = "x509/certvalid"
    permitted_peers: tuple[str, ...] = field(default_factory=tuple)
    prioritize_san: bool = False

    def __post_init__(self) -> None:
        if self.auth_mode not in AUTH_MODES:
            raise ValueError(
                f"unknown auth_mode {self.auth_mode!r}; "
                f"one of {AUTH_MODES}"
            )
        if self.auth_mode != "anon" and not self.ca_file:
            raise ValueError(f"{self.auth_mode} requires ca_file")
        if self.auth_mode in ("x509/fingerprint", "x509/name") and (
            not self.permitted_peers
        ):
            # nsd_ossl SetPermPeers: fingerprint/name without peers is
            # a config error (:719)
            raise ValueError(
                f"{self.auth_mode} requires permitted_peers"
            )


def fingerprint_strs(cert_der: bytes) -> tuple[str, str]:
    """(SHA1, SHA256) fingerprint strings in the reference's exact
    format: prefix + ':%02X' per byte (net_ossl.c:818-843)."""

    def fmt(prefix: str, digest: bytes) -> str:
        return prefix + "".join(f":{b:02X}" for b in digest)

    return (
        fmt("SHA1", hashlib.sha1(cert_der).digest()),
        fmt("SHA256", hashlib.sha256(cert_der).digest()),
    )


def permitted_peer_match(pattern: str, name: str) -> bool:
    """PermittedPeerWildcardMatch (runtime/net.c:356-470): a pattern
    without '*' is a PLAIN entry (whole-string compare); otherwise both
    strings split on '.' and every component must match positionally
    ('*' all / '*suf' suffix / 'pre*' prefix / '' empty), with EQUAL
    component counts."""
    if "*" not in pattern:
        return pattern == name
    pparts = pattern.split(".")
    nparts = name.split(".")
    if len(pparts) != len(nparts):
        return False
    for p, n in zip(pparts, nparts):
        if p == "*":
            continue
        if p.startswith("*"):
            if not n.endswith(p[1:]):
                return False
        elif p.endswith("*"):
            if not n.startswith(p[:-1]):
                return False
        elif p != n:
            return False
    return True


def _subject_oneline(cert_dict: dict) -> str:
    parts = []
    for rdn in cert_dict.get("subject", ()):
        for key, val in rdn:
            parts.append(f"{_ONELINE_KEYS.get(key, key)}={val}")
    return "/" + "/".join(parts) if parts else ""


def _subject_cn(cert_dict: dict) -> str | None:
    for rdn in cert_dict.get("subject", ()):
        for key, val in rdn:
            if key == "commonName":
                return val
    return None


def check_peer(
    cert_der: bytes | None,
    cert_dict: dict | None,
    cfg: TlsConfig,
) -> tuple[bool, str]:
    """osslChkPeerAuth (runtime/nsd_ossl.c:457-…): returns
    (authorized, detail). Chain validity was already enforced by the
    ssl context for every non-anon mode."""
    if cfg.auth_mode == "anon":
        return True, "anon"
    if cert_der is None:
        return False, "peer did not present a certificate"
    if cfg.auth_mode == "x509/certvalid":
        return True, "certificate chain valid"
    if cfg.auth_mode == "x509/fingerprint":
        sha1, sha256 = fingerprint_strs(cert_der)
        for peer in cfg.permitted_peers:
            if peer == sha1 or peer == sha256:
                return True, f"fingerprint match: {peer}"
        return False, (
            f"Fingerprint check failed, not permitted to talk to "
            f"{sha1}"
        )
    # x509/name — identities tried in chkpeername order
    cert_dict = cert_dict or {}
    identities: list[str] = []
    oneline = _subject_oneline(cert_dict)
    if oneline:
        identities.append(oneline)
    have_san = False
    for kind, value in cert_dict.get("subjectAltName", ()):
        have_san = True  # any SAN sets bHaveSAN (net_ossl.c:1026-1031)
        if kind in ("DNS", "IP Address"):
            identities.append(value)
    tried = list(identities)
    for ident in identities:
        for peer in cfg.permitted_peers:
            if permitted_peer_match(peer, ident):
                return True, f"name match: {peer} ~ {ident}"
    if not cfg.prioritize_san or not have_san:
        cn = _subject_cn(cert_dict)
        if cn is not None:
            tried.append(f"CN: {cn}")
            for peer in cfg.permitted_peers:
                if permitted_peer_match(peer, cn):
                    return True, f"name match: {peer} ~ CN {cn}"
    return False, (
        "peer name not authorized, not permitted to talk to it; "
        f"identities: {tried}"
    )


def make_server_context(cfg: TlsConfig) -> ssl.SSLContext:
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cfg.cert_file, cfg.key_file)
    if cfg.auth_mode == "anon":
        ctx.verify_mode = ssl.CERT_NONE
    else:
        ctx.verify_mode = ssl.CERT_REQUIRED
        ctx.load_verify_locations(cfg.ca_file)
    return ctx


def make_client_context(cfg: TlsConfig) -> ssl.SSLContext:
    """Client context. RFC 6125 hostname matching is disabled — the
    reference authorizes the server by auth_mode/permitted_peers
    (checked by the caller via :func:`check_peer`), not by the dialed
    hostname."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.check_hostname = False
    if cfg.auth_mode == "anon":
        ctx.verify_mode = ssl.CERT_NONE
    else:
        ctx.verify_mode = ssl.CERT_REQUIRED
        ctx.load_verify_locations(cfg.ca_file)
    if cfg.cert_file:
        ctx.load_cert_chain(cfg.cert_file, cfg.key_file)
    return ctx
