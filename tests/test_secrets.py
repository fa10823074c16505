"""SecretUtil analog: RSA/3DES config decryption + log masking
(datax_spark/secrets.py). Wire-format compatibility notes live in the
module docstring; these tests pin round-trips, the keystore format, the
``*key`` rename contract, masking, and a LIVE Derby job.json whose JDBC
password travels encrypted."""

from __future__ import annotations

import json
import os

import pytest

from datax_spark.secrets import (
    MASK,
    SecretError,
    _build_3des_key,
    decrypt,
    decrypt_job_config,
    encrypt,
    encrypt_3des,
    decrypt_3des,
    encrypt_rsa,
    decrypt_rsa,
    filter_sensitive,
    generate_rsa_keypair,
    load_keystore,
)


def test_build_3des_key_pads_with_ascii_zero():
    # SecretUtil.build3DesKey: 24-byte buffer prefilled with the
    # CHARACTER '0' (0x30), not NUL — the reference comments call it out
    assert _build_3des_key("abc") == b"abc" + b"0" * 21
    assert _build_3des_key("x" * 30) == b"x" * 24


def test_3des_round_trip_and_key_sensitivity():
    ct = encrypt_3des("s3cr3t-pw", "myKey")
    assert ct != "s3cr3t-pw"
    assert decrypt_3des(ct, "myKey") == "s3cr3t-pw"
    with pytest.raises(SecretError):
        decrypt_3des(ct, "otherKey")


def test_rsa_round_trip():
    priv, pub = generate_rsa_keypair(2048)
    ct = encrypt_rsa("pa55word!", pub)
    assert decrypt_rsa(ct, priv) == "pa55word!"
    other_priv, _ = generate_rsa_keypair(2048)
    with pytest.raises(SecretError):
        decrypt_rsa(ct, other_priv)


def test_dispatch_methods():
    assert decrypt(encrypt("v", "k", "DESede"), "k", "DESede") == "v"
    with pytest.raises(SecretError):
        encrypt("v", "k", "AES")


@pytest.fixture()
def keystore(tmp_path):
    priv, pub = generate_rsa_keypair(2048)
    p = tmp_path / ".secret.properties"
    p.write_text(
        "# datax keystore\n"
        "current.service.username=v3des\n"
        "current.service.password=tripleKey\n"
        f"current.keyVersion=vrsa\n"
        f"current.privateKey={priv}\n"
        f"current.publicKey={pub}\n"
    )
    return str(p)


def test_load_keystore_both_flavors(keystore):
    ks = load_keystore(keystore)
    assert ks["v3des"][0] == "DESede" and ks["v3des"][1] == "tripleKey"
    assert ks["vrsa"][0] == "RSA"
    with pytest.raises(SecretError):
        load_keystore(keystore + ".missing")


@pytest.mark.parametrize("version", ["v3des", "vrsa"])
def test_decrypt_job_config_star_rename(keystore, version):
    ks = load_keystore(keystore)
    method, _, enc_key = ks[version]
    spec = {
        "job": {
            "setting": {"keyVersion": version},
            "content": [
                {
                    "reader": {
                        "name": "mysqlreader",
                        "parameter": {
                            "username": "u",
                            "*password": encrypt("pw!", enc_key, method),
                            "**notSecret": "literal",
                        },
                    }
                }
            ],
        }
    }
    out, paths = decrypt_job_config(spec, ks)
    param = out["job"]["content"][0]["reader"]["parameter"]
    assert param["password"] == "pw!"
    assert "*password" not in param
    assert param["**notSecret"] == "literal"  # charAt(1)=='*' guard
    assert any(p.endswith("password") for p in paths)
    # the input spec is untouched (deep copy)
    assert "*password" in spec["job"]["content"][0]["reader"]["parameter"]


def test_decrypt_job_config_noop_without_keyversion(keystore):
    spec = {"job": {"setting": {}, "content": []}}
    out, paths = decrypt_job_config(spec, keystore)
    assert out == spec and paths == []


def test_decrypt_job_config_unknown_version(keystore):
    spec = {"job": {"setting": {"keyVersion": "nope"}, "content": []}}
    with pytest.raises(SecretError, match="nope"):
        decrypt_job_config(spec, keystore)


def test_filter_sensitive_masks_password_and_accesskey():
    spec = {
        "a": {"password": "pw", "jdbcPassword": "pw2", "accessKey": "ak"},
        "b": [{"Password": "pw3"}, {"user": "safe"}],
    }
    out = filter_sensitive(spec)
    assert out["a"]["password"] == MASK
    assert out["a"]["jdbcPassword"] == MASK  # endsWith, like Engine.java
    assert out["a"]["accessKey"] == MASK
    assert out["b"][0]["Password"] == MASK
    assert out["b"][1]["user"] == "safe"
    dumped = json.dumps(out)
    for leak in ("pw", "pw2", "pw3", "ak"):
        assert f'"{leak}"' not in dumped


def test_encrypted_job_runs_live_derby(spark, tmp_path, keystore):
    """End-to-end: a job.json with an ENCRYPTED JDBC password round-trips
    on the live Derby path (run_job decrypts driver-side before
    compiling), and the plaintext never appears in the masked echo."""
    from datax_spark.plans.job import run_job
    from datax_spark.sources.jdbc import jdbc_execute

    url = f"jdbc:derby:{tmp_path / 'db'};create=true"
    jdbc_execute(
        spark, url,
        "CREATE TABLE DX_SEC (ID INT PRIMARY KEY, NAME VARCHAR(20))",
    )
    jdbc_execute(
        spark, url,
        "INSERT INTO DX_SEC VALUES (1, 'a'), (2, 'b'), (3, 'c')",
    )
    ks = load_keystore(keystore)
    _, _, enc_key = ks["v3des"]
    out_dir = str(tmp_path / "out")
    spec = {
        "job": {
            "setting": {"keyVersion": "v3des"},
            "content": [
                {
                    "reader": {
                        "name": "rdbmsreader",
                        "parameter": {
                            "jdbcUrl": url,
                            "table": "DX_SEC",
                            "column": ["*"],
                            "username": "app",
                            # Derby without auth accepts any credentials;
                            # the point is the DECRYPTION path, exercised
                            # because spark.read.jdbc still passes the
                            # decrypted value through the driver
                            "*password": encrypt_3des("derby-pw", "tripleKey"),
                        },
                    },
                    "writer": {
                        "name": "txtfilewriter",
                        "parameter": {
                            "path": out_dir,
                            "fileType": "csv",
                            "header": True,
                            "writeMode": "truncate",
                        },
                    },
                }
            ],
        }
    }
    run_job(spark, spec, secret_path=keystore)
    got = spark.read.option("header", True).csv(out_dir)
    assert got.count() == 3
    # masked echo leaks neither ciphertext nor plaintext
    masked = json.dumps(filter_sensitive(spec))
    assert "derby-pw" not in masked
    assert spec["job"]["content"][0]["reader"]["parameter"]["*password"] not in masked


def test_properties_colon_separator_with_base64_value(tmp_path):
    """java.util.Properties terminates the key at the FIRST '=' or ':' —
    a colon-keyed line whose base64 value ends in '=' padding must not
    split at the '=' (code-review r4 finding)."""
    from datax_spark.secrets import _load_properties

    p = tmp_path / "colon.properties"
    p.write_text(
        "current.service.username:v1\n"
        "current.service.password:abcDEF==\n"
        "plain=value:with:colons\n"
    )
    props = _load_properties(str(p))
    assert props["current.service.username"] == "v1"
    assert props["current.service.password"] == "abcDEF=="
    assert props["plain"] == "value:with:colons"
