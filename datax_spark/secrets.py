"""Config secrets: the DataX SecretUtil / Engine log-masking analog.

DataX lets a ``job.json`` ship encrypted credential values: any config
key whose last path segment starts with a single ``*`` (``*password``)
holds base64 ciphertext, ``job.setting.keyVersion`` names the key, and a
local keystore (java .properties, ``DATAX_SECRET_PATH``) maps versions
to keys — 3DES (DESede/ECB/PKCS5Padding, ``<prefix>.service.username``/
``.password`` pairs) or RSA (PKCS1 v1.5, ``<prefix>.keyVersion`` +
base64-DER ``privateKey``/``publicKey``), with a ``last``/``current``
rotation pair of each (SecretUtil.java:38-59 + 294-372,
CoreConstant.java:84-150). After decryption the key is renamed without
the ``*`` and its path recorded so serialization/log paths can mask it;
independently, Engine masks every value whose key ends in ``password``
or ``accessKey`` before echoing a config (Engine.java:110-120).

This module reproduces those exact wire formats (a value encrypted by
the reference decrypts here and vice versa — pinned in
tests/test_secrets.py) on the ``cryptography`` package. The Spark plan
never sees ciphertext: ``run_job`` decrypts driver-side before
compiling, and credentials ride JDBC connection properties, not the
plan.
"""

from __future__ import annotations

import base64
import copy
import os
from typing import Any

KEY_3DES = "DESede"
KEY_RSA = "RSA"
MASK = "******"


class SecretError(ValueError):
    """Keystore/ciphertext problem (FrameworkErrorCode.SECRET_ERROR)."""


def _require_crypto():
    try:
        from cryptography.hazmat.primitives.ciphers import (  # noqa: F401
            Cipher,
        )
    except ImportError as e:  # pragma: no cover - baked into this env
        raise SecretError(
            "encrypted job config requires the 'cryptography' package"
        ) from e


def _triple_des():
    # moved namespaces across cryptography versions
    try:
        from cryptography.hazmat.decrepit.ciphers.algorithms import TripleDES
    except ImportError:  # pragma: no cover
        from cryptography.hazmat.primitives.ciphers.algorithms import (
            TripleDES,
        )
    return TripleDES


def _build_3des_key(key_str: str) -> bytes:
    """SecretUtil.build3DesKey: a 24-byte buffer pre-filled with ASCII
    '0' (0x30 — the reference comments call out that it is the CHARACTER
    zero, not NUL), overwritten left-to-right with the key string's
    UTF-8 bytes, truncated at 24."""
    key = bytearray(b"000000000000000000000000")
    temp = key_str.encode("utf-8")
    n = min(len(temp), 24)
    key[:n] = temp[:n]
    return bytes(key)


def encrypt_3des(data: str, key: str) -> str:
    _require_crypto()
    from cryptography.hazmat.primitives import padding as sym_padding
    from cryptography.hazmat.primitives.ciphers import Cipher, modes

    padder = sym_padding.PKCS7(64).padder()
    padded = padder.update(data.encode("utf-8")) + padder.finalize()
    enc = Cipher(_triple_des()(_build_3des_key(key)), modes.ECB()).encryptor()
    return base64.b64encode(enc.update(padded) + enc.finalize()).decode()


def decrypt_3des(data: str, key: str) -> str:
    _require_crypto()
    from cryptography.hazmat.primitives import padding as sym_padding
    from cryptography.hazmat.primitives.ciphers import Cipher, modes

    try:
        dec = Cipher(
            _triple_des()(_build_3des_key(key)), modes.ECB()
        ).decryptor()
        padded = dec.update(base64.b64decode(data)) + dec.finalize()
        unpadder = sym_padding.PKCS7(64).unpadder()
        return (unpadder.update(padded) + unpadder.finalize()).decode("utf-8")
    except Exception as e:
        raise SecretError(f"3DES decrypt failed: {e}") from e


def encrypt_rsa(data: str, b64_public_key_der: str) -> str:
    """RSA/ECB/PKCS1Padding with an X.509 (SubjectPublicKeyInfo) DER
    public key, both base64 — SecretUtil.encryptRSA."""
    _require_crypto()
    from cryptography.hazmat.primitives.asymmetric import padding
    from cryptography.hazmat.primitives.serialization import (
        load_der_public_key,
    )

    pub = load_der_public_key(base64.b64decode(b64_public_key_der))
    ct = pub.encrypt(data.encode("utf-8"), padding.PKCS1v15())
    return base64.b64encode(ct).decode()


def decrypt_rsa(data: str, b64_private_key_der: str) -> str:
    """RSA PKCS1 v1.5 with a PKCS8 DER private key, both base64 —
    SecretUtil.decryptRSA."""
    _require_crypto()
    from cryptography.hazmat.primitives.asymmetric import padding
    from cryptography.hazmat.primitives.serialization import (
        load_der_private_key,
    )

    try:
        priv = load_der_private_key(
            base64.b64decode(b64_private_key_der), password=None
        )
        pt = priv.decrypt(base64.b64decode(data), padding.PKCS1v15())
        return pt.decode("utf-8")
    except Exception as e:
        raise SecretError(f"RSA decrypt failed: {e}") from e


def encrypt(data: str, key: str, method: str) -> str:
    if method == KEY_RSA:
        return encrypt_rsa(data, key)
    if method == KEY_3DES:
        return encrypt_3des(data, key)
    raise SecretError(f"unsupported encryption method {method!r}")


def decrypt(data: str, key: str, method: str) -> str:
    if method == KEY_RSA:
        return decrypt_rsa(data, key)
    if method == KEY_3DES:
        return decrypt_3des(data, key)
    raise SecretError(f"unsupported encryption method {method!r}")


def generate_rsa_keypair(bits: int = 2048) -> tuple[str, str]:
    """(private_b64_pkcs8_der, public_b64_x509_der) — the reference's
    initKey format; used by tests and by admins provisioning a keystore."""
    _require_crypto()
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.hazmat.primitives.serialization import (
        Encoding,
        NoEncryption,
        PrivateFormat,
        PublicFormat,
    )

    key = rsa.generate_private_key(public_exponent=65537, key_size=bits)
    priv = key.private_bytes(
        Encoding.DER, PrivateFormat.PKCS8, NoEncryption()
    )
    pub = key.public_key().public_bytes(
        Encoding.DER, PublicFormat.SubjectPublicKeyInfo
    )
    return base64.b64encode(priv).decode(), base64.b64encode(pub).decode()


def _load_properties(path: str) -> dict[str, str]:
    """Minimal java .properties reader (key=value / key:value lines,
    ``#``/``!`` comments, trailing-backslash continuations)."""
    props: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        pending = ""
        for raw in f:
            line = pending + raw.strip()
            pending = ""
            if not line or line[0] in "#!":
                continue
            if line.endswith("\\"):
                pending = line[:-1]
                continue
            # java.util.Properties terminates the key at the FIRST '=' or
            # ':', whichever comes first — base64 values contain '=', so
            # preferring '=' outright would mis-parse 'key:MIIE...==' lines
            cuts = [i for i in (line.find("="), line.find(":")) if i >= 0]
            if cuts:
                i = min(cuts)
                props[line[:i].strip()] = line[i + 1:].strip()
    return props


def load_keystore(path: str) -> dict[str, tuple[str, str, str]]:
    """keyVersion -> (method, decrypt_key, encrypt_key), mirroring
    SecretUtil.getPrivateKeyMap over the last/current rotation pairs:
    3DES registers under ``<prefix>.service.username`` with the shared
    key as both sides; RSA under ``<prefix>.keyVersion`` with
    (privateKey, publicKey)."""
    if not os.path.exists(path):
        raise SecretError(f"encrypted job config, but no keystore at {path}")
    props = _load_properties(path)
    out: dict[str, tuple[str, str, str]] = {}
    for prefix in ("last", "current"):
        user = props.get(f"{prefix}.service.username")
        if user:
            pw = props.get(f"{prefix}.service.password")
            if not pw:
                raise SecretError(
                    f"key version {user!r}: empty 3DES key in keystore"
                )
            out[user] = (KEY_3DES, pw, pw)
        kv = props.get(f"{prefix}.keyVersion")
        if kv:
            priv = props.get(f"{prefix}.privateKey")
            pub = props.get(f"{prefix}.publicKey")
            if not (priv and pub):
                raise SecretError(
                    f"key version {kv!r}: incomplete RSA pair in keystore"
                )
            out[kv] = (KEY_RSA, priv, pub)
    if not out:
        raise SecretError(f"keystore {path} defines no key versions")
    return out


def decrypt_job_config(
    spec: dict[str, Any], keystore: dict[str, tuple[str, str, str]] | str
) -> tuple[dict[str, Any], list[str]]:
    """Decrypt every ``*``-prefixed config value in a job dict.

    Returns (decrypted copy, dotted paths of the decrypted keys — the
    ``secretKeyPath`` set the reference tracks for masking). No-op when
    ``job.setting.keyVersion`` is absent, exactly like
    SecretUtil.decryptSecretKey. A ``**``-prefixed key is literal data,
    not a secret (the reference's charAt(1) != '*' guard).
    """
    key_version = (
        (spec.get("job", {}).get("setting", {}) or {}).get("keyVersion")
    )
    if not key_version:
        return spec, []
    if isinstance(keystore, str):
        keystore = load_keystore(keystore)
    if key_version not in keystore:
        raise SecretError(
            f"job requires key version {key_version!r}, not in keystore"
        )
    method, decrypt_key, _ = keystore[key_version]

    paths: list[str] = []

    def walk(node: Any, at: str) -> Any:
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    isinstance(k, str)
                    and len(k) > 1
                    and k[0] == "*"
                    and k[1] != "*"
                    and isinstance(v, str)
                ):
                    new_k = k[1:]
                    out[new_k] = decrypt(v, decrypt_key, method)
                    paths.append(f"{at}{new_k}")
                else:
                    out[k] = walk(v, f"{at}{k}.")
            return out
        if isinstance(node, list):
            return [walk(v, f"{at}{i}.") for i, v in enumerate(node)]
        return node

    return walk(copy.deepcopy(spec), ""), paths


def filter_sensitive(spec: dict[str, Any]) -> dict[str, Any]:
    """Deep copy with every string value masked whose key ends in
    ``password`` or ``accessKey`` (case-insensitive) — what any log or
    report echo of a job config must pass through
    (Engine.filterSensitiveConfiguration)."""

    def walk(node: Any) -> Any:
        if isinstance(node, dict):
            return {
                k: (
                    MASK
                    if isinstance(k, str)
                    and isinstance(v, str)
                    and (
                        k.lower().endswith("password")
                        or k.lower().endswith("accesskey")
                    )
                    else walk(v)
                )
                for k, v in node.items()
            }
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(copy.deepcopy(spec))
