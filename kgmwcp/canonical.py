"""Canonical metadata-element model + serialization.

Re-implements (from scratch) the observable serialization semantics of the
reference's ``mwcp.metadata`` element model so that emitted triples can be
compared against reference report JSON:

* every element has a snake_case ``type`` discriminator derived from its
  class name (reference: mwcp/metadata.py:124-126,221-225),
* tags are deduped + kept sorted (reference: mwcp/metadata.py:423-435),
* JSON serialization keeps ``None`` fields as ``null``, encodes bytes as
  base64 and nested elements as dicts carrying their own ``type`` field
  (reference: mwcp/metadata.py:373-397),
* equality is structural over all fields including tags (attrs-generated
  ``__eq__`` in the reference) — here: equality of the canonical payload.

The canonical triple object string ``obj`` is the compact JSON of the
element's payload with **sorted keys** and without the top-level ``type``
(the triple's ``pred`` carries it).  Nested elements keep their ``type``
inside the payload, matching the reference's nested serialization (see the
``network`` entry of mwcp/parsers/tests/foo/f144899b86766688991c5d0d10902f4a.json).
"""

from __future__ import annotations

import base64
import json
import re
from typing import Any, Dict, List, Optional

__all__ = [
    "Element",
    "URL",
    "Socket",
    "Network",
    "EmailAddress",
    "Other",
    "FileElement",
    "PathElement",
    "Mutex",
    "DecodedString",
    "canonical_obj",
    "ValidationError",
    "PRED_VOCABULARY",
]

# The full pred vocabulary of the reference schema (Element._type() names,
# mwcp/metadata.py — see SURVEY.md §1.3).  Kept complete even though only a
# subset is emitted by the currently implemented extractors.
PRED_VOCABULARY = [
    "path", "alphabet", "command", "credential", "crypto_address",
    "scheduled_task", "socket", "url", "network", "email_address", "event",
    "uuid", "uuid_legacy", "injection_process", "interval", "interval_legacy",
    "encryption_key", "decoded_string", "mission_id", "mutex", "other",
    "pipe", "registry", "rsa_private_key", "rsa_public_key", "service",
    "ssl_cert_sha1", "user_agent", "version", "file",
]


class ValidationError(ValueError):
    """Raised when an element fails field validation.

    Mirrors the reference behavior where an invalid element is logged and
    dropped rather than aborting the run (mwcp/report.py:772-791).
    """


def _b64(value: bytes) -> str:
    return base64.b64encode(value).decode("ascii")


def _jsonable(value: Any) -> Any:
    """Convert payload values to JSON-encodable form (bytes -> base64)."""
    if isinstance(value, bytes):
        return _b64(value)
    if isinstance(value, list):
        return [_jsonable(v) for v in value]
    if isinstance(value, Element):
        return value.payload(nested=True)
    if isinstance(value, dict):
        return {k: _jsonable(v) for k, v in value.items()}
    return value


_CAMEL_1 = re.compile(r"(.)([A-Z][a-z]+)")
_CAMEL_2 = re.compile(r"([a-z0-9])([A-Z])")


def camel_to_snake(name: str) -> str:
    """Same normalization as the reference's ``_camel_to_snake``."""
    return _CAMEL_2.sub(r"\1_\2", _CAMEL_1.sub(r"\1_\2", name)).lower()


class Element:
    """Base metadata element.

    Subclasses declare ``FIELDS`` (ordered field names) and set instance
    attributes of the same names.  ``TYPE`` overrides the derived type name
    (the reference overrides e.g. Path2 -> "path", Socket2 -> "socket").
    """

    FIELDS: tuple = ()
    TYPE: Optional[str] = None

    def __init__(self) -> None:
        self.tags: List[str] = []

    @classmethod
    def type_name(cls) -> str:
        # memoized per class (hot path: called for every emitted triple)
        cached = cls.__dict__.get("_TYPE_NAME")
        if cached is None:
            cached = cls.TYPE or camel_to_snake(cls.__name__)
            cls._TYPE_NAME = cached
        return cached

    def add_tag(self, *tags: str) -> "Element":
        for tag in tags:
            if tag not in self.tags:
                self.tags.append(tag)
        self.tags = sorted(self.tags)
        return self

    def validate(self) -> None:
        """Field validation hook; raises ValidationError when invalid."""

    # -- serialization -----------------------------------------------------
    def payload(self, nested: bool = False) -> Dict[str, Any]:
        """Dict form of the element.

        ``nested=True`` adds the ``type`` discriminator, matching how the
        reference serializes sub-elements inside a parent element.
        """
        out: Dict[str, Any] = {}
        if nested:
            out["type"] = self.type_name()
        out["tags"] = sorted(self.tags)
        for field in self.FIELDS:
            out[field] = _jsonable(getattr(self, field))
        return out

    def canonical(self) -> str:
        """Canonical compact JSON of the payload (sorted keys)."""
        return json.dumps(self.payload(), sort_keys=True, separators=(",", ":"))

    # -- structure ---------------------------------------------------------
    def sub_elements(self) -> List["Element"]:
        """Nested elements contained in this element (excluding self).

        Mirrors ``Element.elements()`` flattening (mwcp/metadata.py:402-415)
        used by ``Report.iter`` when building per-source report models.
        """
        subs: List[Element] = []
        for field in self.FIELDS:
            value = getattr(self, field)
            if isinstance(value, Element):
                subs.append(value)
                subs.extend(value.sub_elements())
            elif isinstance(value, list):
                for item in value:
                    if isinstance(item, Element):
                        subs.append(item)
                        subs.extend(item.sub_elements())
        return subs

    def post_processing(self, report) -> None:
        """Hook run when the element is added to a report context."""

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, Element)
            and self.type_name() == other.type_name()
            and self.payload(nested=True) == other.payload(nested=True)
        )

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<{self.type_name()} {self.canonical()}>"


class Socket(Element):
    """Network socket (reference Socket2, mwcp/metadata.py:952-1080)."""

    FIELDS = ("address", "port", "network_protocol", "listen")
    TYPE = "socket"
    _VALID_PROTOCOLS = ("icmp", "tcp", "udp")

    def __init__(self, address=None, port=None, network_protocol=None,
                 listen=None, c2: bool = False):
        super().__init__()
        self.address = address
        try:
            self.port = int(port) if port is not None else None
        except (TypeError, ValueError):
            # non-numeric port (e.g. a credentialed URL's 'pass@host'
            # mis-split — the reference's TODO'd userinfo gap,
            # metadata.py:1193): a plain ValueError would escape the
            # validation-as-filter contract and abort the whole rule run
            raise ValidationError(f"Invalid port: {port!r}")
        self.network_protocol = (
            str(network_protocol).lower() if network_protocol is not None else None
        )
        self.listen = listen
        # internal flag for legacy Port()/ListenPort() constructors
        self._from_port = False
        if c2:
            self.add_tag("c2")
        self.validate()

    def validate(self) -> None:
        if self.port is not None and not 0 <= self.port <= 65535:
            raise ValidationError(f"port must be between 0 and 65535. Got {self.port}")
        if (self.network_protocol is not None
                and self.network_protocol not in self._VALID_PROTOCOLS):
            raise ValidationError(
                f"protocol {self.network_protocol} is not one of {sorted(self._VALID_PROTOCOLS)}"
            )


# URL splitting regex — behavior-compatible with the reference's URL2._URL_RE
# (mwcp/metadata.py:1151-1155): optional app protocol, bracketed-ipv6-aware
# address, path up to '?', query = the rest.
_URL_SPLIT_RE = re.compile(
    r"((?P<app_protocol>[a-z.\-+]{1,40})://)?(?P<address>\[?[^/]+\]?)"
    r"(?P<path>/[^?]+)?(?P<query>.*)",
    flags=re.IGNORECASE,
)


class URL(Element):
    """RFC-3986-ish URL (reference URL2, mwcp/metadata.py:1134-1280)."""

    FIELDS = ("url", "path", "query", "protocol")
    TYPE = "url"

    def __init__(self, url=None, path=None, query=None, protocol=None,
                 socket: Optional[Socket] = None):
        super().__init__()
        self.url = url
        self.path = path
        self.query = query
        self.protocol = protocol
        self._socket = socket
        self._credential = None
        self._processed = False
        if self.url:
            self._split_url()

    def _split_url(self) -> None:
        match = _URL_SPLIT_RE.match(self.url)
        if not match:
            raise ValidationError(f"Error parsing as url: {self.url}")
        app_protocol = match.group("app_protocol") or None
        path = match.group("path") or None
        query = match.group("query") or None
        port = None
        address = match.group("address")
        if address:
            address = address.rstrip(": ")
            if address.startswith("["):
                # bracketed ipv6, e.g. [fe80::1]:80.  NOTE: a bracketed
                # host with NO port keeps its trailing ']' — bug-for-bug
                # with the reference's identical partition("]:") logic
                # (metadata.py:1180-1184)
                address, found, port = address[1:].partition("]:")
            else:
                address, found, port = address.partition(":")
            if found and not port:
                raise ValidationError(
                    f"Invalid URL {self.url}, found ':' at end without a port."
                )
            if not port:
                port = None
        if address or port:
            try:
                self._socket = Socket(address=address or None, port=port)
            except ValidationError:
                # deviation from the reference, which has no port
                # converter and would carry a garbage string port (e.g.
                # 'pass@evil.com' from a credentialed URL) into the
                # report: keep the URL element, drop only the socket
                self._socket = None
        if not self.path:
            self.path = path
        if not self.query:
            self.query = query
        if not self.protocol:
            self.protocol = app_protocol

    def post_processing(self, report) -> None:
        # URL with socket/credential spawns a Network element
        # (reference mwcp/metadata.py:1261-1274).
        if not self._processed:
            self._processed = True
            if self._socket or self._credential:
                network = Network(url=self, socket=self._socket,
                                  credential=self._credential)
                if "c2" in self.tags:
                    network.add_tag("c2")
                    if self._socket:
                        self._socket.add_tag("c2")
                report.add(network)


class Network(Element):
    """URL + Socket + Credential bundle (mwcp/metadata.py:1313-1390)."""

    FIELDS = ("url", "socket", "credential")

    def __init__(self, url: Optional[URL] = None, socket: Optional[Socket] = None,
                 credential=None):
        super().__init__()
        self.url = url
        self.socket = socket
        self.credential = credential
        if self.url is not None and not self.url._processed:
            if not self.socket:
                self.socket = self.url._socket
            if not self.credential:
                self.credential = self.url._credential
            self.url._processed = True
        if sum(map(bool, [self.url, self.socket, self.credential])) < 2:
            raise ValidationError(
                f"Network object must have at least 2 fields provided: {self!r}"
            )

    def post_processing(self, report) -> None:
        # c2 tag propagation socket -> network + url (mwcp/metadata.py:1334-1338)
        if self.socket is not None and "c2" in self.socket.tags:
            self.add_tag("c2")
            if self.url is not None:
                self.url.add_tag("c2")


class EmailAddress(Element):
    """mwcp/metadata.py:1548-1570."""

    FIELDS = ("value",)

    def __init__(self, value):
        super().__init__()
        if isinstance(value, bytes):
            value = value.decode("latin1")
        self.value = value
        self.validate()

    def validate(self) -> None:
        if "@" not in self.value:
            raise ValidationError("Email address should at least have a '@' character.")


class Other(Element):
    """Key/value catch-all with value_format discriminator (mwcp/metadata.py:1970-2040)."""

    FIELDS = ("key", "value", "value_format")

    def __init__(self, key, value):
        super().__init__()
        self.key = key
        self.value = value
        if isinstance(value, bool):
            self.value_format = "boolean"
        elif isinstance(value, int):
            self.value_format = "integer"
        elif isinstance(value, str):
            self.value_format = "string"
        elif isinstance(value, bytes):
            self.value_format = "bytes"
        else:
            raise ValidationError(f"Got unexpected data: {value!r}")


class Mutex(Element):
    """mwcp/metadata.py:1952-1967."""

    FIELDS = ("value",)

    def __init__(self, value):
        super().__init__()
        self.value = value


class DecodedString(Element):
    """mwcp/metadata.py:1890-1915 (encryption_key omitted in v0 emitters)."""

    FIELDS = ("value",)

    def __init__(self, value):
        super().__init__()
        self.value = value


class PathElement(Element):
    """Filesystem path (reference Path2, mwcp/metadata.py:492-603)."""

    FIELDS = ("path", "is_dir", "posix", "file_system")
    TYPE = "path"

    def __init__(self, path, is_dir=None, posix=None, file_system=None):
        super().__init__()
        self.path = path
        self.is_dir = is_dir
        self.posix = posix
        self.file_system = file_system
        # posix autodetect from separators / drive letter
        if self.posix is None and (path.count("\\") or path.count("/")):
            self.posix = not (
                re.match(r"^[A-Z]:\\", path) or path.count("\\") > path.count("/")
            )


class FileElement(Element):
    """Residual/input file row (reference metadata.File, mwcp/metadata.py:2790-2880).

    ``data`` stays None in reports (include_file_data defaults False,
    mwcp/report.py:536-541); hashes are still derived from the raw bytes.
    """

    FIELDS = ("name", "description", "md5", "sha1", "sha256", "architecture",
              "compile_time", "file_path", "data", "derivation")
    TYPE = "file"

    def __init__(self, name=None, description=None, md5=None, sha1=None,
                 sha256=None, architecture=None, compile_time=None,
                 file_path=None, data=None, derivation=None):
        super().__init__()
        import hashlib

        self.name = name
        self.description = description
        self.md5 = md5
        self.sha1 = sha1
        self.sha256 = sha256
        self.architecture = architecture
        self.compile_time = compile_time
        self.file_path = file_path
        self.derivation = derivation
        if data is not None:
            if not self.md5:
                self.md5 = hashlib.md5(data).hexdigest()
            if not self.sha1:
                self.sha1 = hashlib.sha1(data).hexdigest()
            if not self.sha256:
                self.sha256 = hashlib.sha256(data).hexdigest()
        # Report output never carries raw bytes (include_file_data=False).
        self.data = None


class RSAPublicKey(Element):
    """mwcp/metadata.py:2484-2489 — unbounded ints serialize as JSON numbers."""

    FIELDS = ("public_exponent", "modulus")
    TYPE = "rsa_public_key"

    def __init__(self, public_exponent=None, modulus=None):
        super().__init__()
        self.public_exponent = public_exponent
        self.modulus = modulus


class RSAPrivateKey(Element):
    """mwcp/metadata.py:2320-2340 field set (PKCS#1 components)."""

    FIELDS = ("public_exponent", "modulus", "private_exponent", "p", "q",
              "d_mod_p1", "d_mod_q1", "q_inv_mod_p")
    TYPE = "rsa_private_key"

    def __init__(self, public_exponent=None, modulus=None, private_exponent=None,
                 p=None, q=None, d_mod_p1=None, d_mod_q1=None, q_inv_mod_p=None):
        super().__init__()
        self.public_exponent = public_exponent
        self.modulus = modulus
        self.private_exponent = private_exponent
        self.p = p
        self.q = q
        self.d_mod_p1 = d_mod_p1
        self.d_mod_q1 = d_mod_q1
        self.q_inv_mod_p = q_inv_mod_p


# deliberately UNANCHORED at the end — bug-for-bug with the reference's
# _SHA1_RE.match (metadata.py:2737-2741): a 64-char sha256 hex passes
_SHA1_RE = re.compile(r"[0-9a-fA-F]{40}")


class SSLCertSHA1(Element):
    """mwcp/metadata.py:2730-2748."""

    FIELDS = ("value",)
    TYPE = "ssl_cert_sha1"

    def __init__(self, value):
        super().__init__()
        self.value = value
        self.validate()

    def validate(self) -> None:
        if not _SHA1_RE.match(self.value or ""):
            raise ValidationError(f"Invalid SHA1 hash found: {self.value!r}")


class Credential(Element):
    """mwcp/metadata.py:740-800 (username/password pair)."""

    FIELDS = ("username", "password")

    def __init__(self, username=None, password=None):
        super().__init__()
        self.username = username
        self.password = password


class UserAgent(Element):
    """mwcp/metadata.py:2752-2760."""

    FIELDS = ("value",)

    def __init__(self, value):
        super().__init__()
        self.value = value


class Pipe(Element):
    """mwcp/metadata.py:2042-2055."""

    FIELDS = ("value",)

    def __init__(self, value):
        super().__init__()
        self.value = value


class Event(Element):
    """mwcp/metadata.py:1572-1588."""

    FIELDS = ("value",)

    def __init__(self, value):
        super().__init__()
        self.value = value


class Command(Element):
    """Shell command (mwcp/metadata.py:707-737)."""

    FIELDS = ("value", "cwd")

    def __init__(self, value, cwd=None):
        super().__init__()
        self.value = value
        self.cwd = cwd


class Alphabet(Element):
    """Generic baseXX alphabet (mwcp/metadata.py:645-675)."""

    FIELDS = ("alphabet", "base")

    def __init__(self, alphabet, base):
        super().__init__()
        self.alphabet = alphabet
        self.base = base
        self.validate()

    def validate(self) -> None:
        if self.alphabet and self.base:
            if len(self.alphabet) not in (self.base, self.base + 1):
                raise ValidationError(
                    "Invalid alphabet provided: Length of alphabet must be "
                    "size of base or base + 1 (if including the pad character)."
                )


class CryptoAddress(Element):
    """Cryptocurrency address (mwcp/metadata.py:770-806)."""

    FIELDS = ("address", "symbol")

    def __init__(self, address, symbol=None):
        super().__init__()
        self.address = address
        self.symbol = symbol


class ScheduledTask(Element):
    """Windows scheduled task (mwcp/metadata.py:823-950)."""

    FIELDS = ("actions", "name", "description", "author", "credentials")

    def __init__(self, actions=None, name=None, description=None, author=None,
                 credentials=None):
        super().__init__()
        if actions is not None and not isinstance(actions, list):
            actions = [actions]
        if actions is not None:
            actions = [Command(a) if isinstance(a, str) else a for a in actions]
        self.actions = actions
        self.name = name
        self.description = description
        self.author = author
        self.credentials = credentials

    @classmethod
    def from_xml(cls, xml_data: str) -> "ScheduledTask":
        """Task-Scheduler XML parse, matching mwcp/metadata.py:851-892."""
        from xml.etree import ElementTree

        xml_data = xml_data.strip()
        xml_data = re.sub(' xmlns="[^"]+"', "", xml_data, count=1)
        try:
            root = ElementTree.fromstring(xml_data)
        except ElementTree.ParseError as exc:
            raise ValueError(f"Failed to parse XML data: {exc}")
        if root.tag != "Task":
            raise ValueError(f"Expected root tag to be 'Task', got '{root.tag}'")
        description = author = None
        registration = root.find("RegistrationInfo")
        if registration is not None:
            node = registration.find("Description")
            description = node.text if node is not None else None
            node = registration.find("Author")
            author = node.text if node is not None else None
        actions_meta = []
        actions = root.find("Actions")
        if actions is not None:
            for action in actions.findall("Exec"):
                command = action.find("Command")
                if command is None:
                    raise ValueError("Expected 'Command' tag.")
                command = command.text or ""
                arguments = action.find("Arguments")
                if arguments is not None and arguments.text:
                    command += " " + arguments.text
                cwd_node = action.find("WorkingDirectory")
                cwd = cwd_node.text if cwd_node is not None else None
                actions_meta.append(Command(command, cwd=cwd))
        return cls(actions_meta, description=description, author=author)


class UUIDElement(Element):
    """128-bit identifier (mwcp/metadata.py:1613-1630); value normalized
    through uuid.UUID and serialized as its canonical string."""

    FIELDS = ("value",)
    TYPE = "uuid"

    def __init__(self, value):
        super().__init__()
        import uuid as _uuid

        try:
            if isinstance(value, str):
                value = _uuid.UUID(value)
            elif isinstance(value, bytes):
                value = _uuid.UUID(bytes=value)
            elif isinstance(value, int):
                value = _uuid.UUID(int=value)
            elif not isinstance(value, _uuid.UUID):
                raise ValueError(f"Invalid UUID: {value}")
        except Exception as exc:
            raise ValidationError(f"Invalid UUID: {exc}")
        self.value = str(value)


class Interval(Element):
    """Beacon interval seconds, float (mwcp/metadata.py:1678-1695)."""

    FIELDS = ("value",)

    def __init__(self, value):
        super().__init__()
        self.value = float(value)


class InjectionProcess(Element):
    """mwcp/metadata.py:1654-1672."""

    FIELDS = ("value",)

    def __init__(self, value):
        super().__init__()
        self.value = value


class MissionID(Element):
    """mwcp/metadata.py:2075-2092."""

    FIELDS = ("value",)
    TYPE = "mission_id"

    def __init__(self, value):
        super().__init__()
        self.value = value


class Version(Element):
    """mwcp/metadata.py:2769-2781."""

    FIELDS = ("value",)

    def __init__(self, value):
        super().__init__()
        self.value = value


# Tests encodings in order by preference (mwcp/metadata.py:1744-1748).
_TEST_ENCODINGS = ["ascii", "utf-32-be", "utf-32-le", "utf-16-be", "utf-16-le", "utf-8"]


def _num_raw_bytes(string: str) -> int:
    """Escaped-codepoint score used by encoding detection (mwcp/metadata.py:1791-1800)."""
    count = 0
    for char in string:
        escaped = char.encode("unicode-escape")
        count += escaped.startswith(b"\\x") + escaped.startswith(b"\\u") * 2
    return count


def detect_encoding(data: bytes) -> Optional[str]:
    """Best-guess display encoding (mwcp/metadata.py:1802-1832 semantics)."""
    if not data:
        return None
    best_score = len(data)
    best_code_page = None
    for code_page in _TEST_ENCODINGS:
        try:
            output = data.decode(code_page)
        except UnicodeDecodeError:
            continue
        if not output.isprintable():
            continue
        score = _num_raw_bytes(output)
        if not best_code_page or score < best_score:
            best_score = score
            best_code_page = code_page
    return best_code_page


class EncryptionKey(Element):
    """Key material (mwcp/metadata.py:1737-1880); bytes fields -> base64."""

    FIELDS = ("key", "algorithm", "mode", "iv", "secret", "key_derivation")

    def __init__(self, key, algorithm=None, mode=None, iv=None, secret=None,
                 key_derivation=None):
        super().__init__()
        if isinstance(key, str):
            key = key.encode("utf-8")
        self.key = key
        self.algorithm = algorithm
        self.mode = mode
        self.iv = iv
        self.secret = secret
        self.key_derivation = key_derivation

    def display_key(self) -> str:
        """Presentation form: hex + detected-encoding context
        (mwcp/metadata.py:1836-1842)."""
        value = f"0x{self.key.hex()}"
        encoding = detect_encoding(self.key)
        if encoding:
            value += f' ("{self.key.decode(encoding)}")'
        return value


class DecodedString2(DecodedString):
    """DecodedString with optional encryption key (mwcp/metadata.py:1890-1915).

    Kept as a subclass so the simple constructor in extractors stays cheap.
    """

    FIELDS = ("value", "encryption_key")
    TYPE = "decoded_string"

    def __init__(self, value, encryption_key: Optional[EncryptionKey] = None):
        Element.__init__(self)
        self.value = value
        self.encryption_key = encryption_key


_REGISTRY_HIVES = {
    # canonical names with values from winreg.h (mwcp/metadata.py:2056-2079)
    "HKEY_CLASSES_ROOT": 0x80000000,
    "HKEY_CURRENT_USER": 0x80000001,
    "HKEY_LOCAL_MACHINE": 0x80000002,
    "HKEY_USERS": 0x80000003,
    "HKEY_PERFORMANCE_DATA": 0x80000004,
    "HKEY_CURRENT_CONFIG": 0x80000005,
    "HKEY_DYN_DATA": 0x80000006,
    "HKEY_CURRENT_USER_LOCAL_SETTINGS": 0x80000007,
    "HKEY_PERFORMANCE_TEXT": 0x80000050,
    "HKEY_PERFORMANCE_NLSTEXT": 0x80000060,
}
_REGISTRY_HIVE_ALIASES = {
    "HKCR": "HKEY_CLASSES_ROOT", "HKCU": "HKEY_CURRENT_USER",
    "HKLM": "HKEY_LOCAL_MACHINE", "HKU": "HKEY_USERS",
    "HKPD": "HKEY_PERFORMANCE_DATA", "HKCC": "HKEY_CURRENT_CONFIG",
    "HKDD": "HKEY_DYN_DATA", "HKCULS": "HKEY_CURRENT_USER_LOCAL_SETTINGS",
    "HKPT": "HKEY_PERFORMANCE_TEXT", "HKPN": "HKEY_PERFORMANCE_NLSTEXT",
}


def _hive_name(name: str) -> Optional[str]:
    name = name.upper()
    if name in _REGISTRY_HIVES:
        return name
    return _REGISTRY_HIVE_ALIASES.get(name)


class Registry(Element):
    """Registry key/value/data with normalization (mwcp/metadata.py:2095-2260).

    Enums serialize by NAME (hive -> "HKEY_LOCAL_MACHINE", data_type ->
    "REG_SZ"), matching the reference's cattr enum hook.
    """

    FIELDS = ("hive", "subkey", "value", "data", "data_type")
    TYPE = "registry"

    def __init__(self, hive=None, subkey=None, value=None, data=None, data_type=None):
        super().__init__()
        self.hive = hive
        self.subkey = subkey
        self.value = value
        self.data = data
        self.data_type = data_type

        # Pull out hive if it was included in subkey.
        if not self.hive and self.subkey:
            head, _, rest = self.subkey.partition("\\")
            canonical = _hive_name(head)
            if canonical:
                self.hive = canonical
                self.subkey = rest
        elif self.hive:
            canonical = _hive_name(str(self.hive))
            if canonical is None:
                raise ValidationError(f"Unknown registry hive: {self.hive}")
            self.hive = canonical

        if self.subkey:
            self.subkey = self.subkey.strip("\\")

        # Infer data_type from the python type of data.
        if self.data_type is None and self.data is not None:
            if isinstance(self.data, str):
                self.data_type = "REG_MULTI_SZ" if self.data.count("\0") > 1 else "REG_SZ"
            elif isinstance(self.data, list) and all(isinstance(e, str) for e in self.data):
                self.data_type = "REG_MULTI_SZ"
            elif isinstance(self.data, bytes):
                self.data_type = "REG_BINARY"
            elif isinstance(self.data, int):
                self.data_type = "REG_DWORD" if self.data <= 0xFFFFFFFF else "REG_QWORD"

        # MULTI_SZ given as one NUL-joined string -> split on NULs.
        if self.data_type == "REG_MULTI_SZ" and isinstance(self.data, str) and "\0" in self.data:
            if self.data.endswith("\0"):
                self.data = self.data[:-1]
            self.data = self.data.split("\0")

        # Strip trailing NUL terminator on plain strings.
        if self.data and self.data_type == "REG_SZ":
            self.data = self.data.rstrip("\0")

        if isinstance(self.data, int) and self.data < 0:
            raise ValidationError(f"Integer data value must be positive. Got {self.data}")

    @classmethod
    def from_path(cls, path, data=None) -> "Registry":
        """Last path segment is the value name (mwcp/metadata.py:2170-2180)."""
        if isinstance(path, bytes):
            path = path.decode("utf8")
        subkey, _, value = path.rpartition("\\")
        return cls(subkey=subkey or None, value=value or None, data=data)

    @property
    def key(self) -> Optional[str]:
        if self.hive and self.subkey:
            return f"{self.hive}\\{self.subkey}"
        return self.subkey


class Service(Element):
    """Windows service (mwcp/metadata.py:2605-2641); post_processing emits
    FilePath rows for image/dll like the reference."""

    FIELDS = ("name", "display_name", "description", "image", "dll")

    def __init__(self, name=None, display_name=None, description=None,
                 image=None, dll=None):
        super().__init__()
        self.name = name
        self.display_name = display_name
        self.description = description
        self.image = image
        self.dll = dll

    def post_processing(self, report) -> None:
        # first-.exe path heuristic kept for legacy parity (metadata.py:2631-2641)
        if self.image and ".exe" in self.image:
            report.add(PathElement(
                self.image[:self.image.find(".exe") + 4], is_dir=False))
        if self.dll:
            report.add(PathElement(self.dll, is_dir=False))


class UUIDLegacy(Element):
    """Unvalidated raw-string UUID (mwcp/metadata.py:1634-1650)."""

    FIELDS = ("value",)
    TYPE = "uuid_legacy"

    def __init__(self, value):
        super().__init__()
        self.value = value


class IntervalLegacy(Element):
    """String-typed interval preserving original display (mwcp/metadata.py:1698-1715)."""

    FIELDS = ("value",)
    TYPE = "interval_legacy"

    def __init__(self, value):
        super().__init__()
        self.value = value


#: pred name -> element class for every vocabulary entry
ELEMENT_CLASSES = {
    "path": PathElement, "alphabet": Alphabet, "command": Command,
    "credential": Credential, "crypto_address": CryptoAddress,
    "scheduled_task": ScheduledTask, "socket": Socket, "url": URL,
    "network": Network, "email_address": EmailAddress, "event": Event,
    "uuid": UUIDElement, "uuid_legacy": UUIDLegacy,
    "injection_process": InjectionProcess, "interval": Interval,
    "interval_legacy": IntervalLegacy, "encryption_key": EncryptionKey,
    "decoded_string": DecodedString2, "mission_id": MissionID,
    "mutex": Mutex, "other": Other, "pipe": Pipe, "registry": Registry,
    "rsa_private_key": RSAPrivateKey, "rsa_public_key": RSAPublicKey,
    "service": Service, "ssl_cert_sha1": SSLCertSHA1,
    "user_agent": UserAgent, "version": Version, "file": FileElement,
}


def canonical_obj(element: Element) -> str:
    """Triple ``obj`` string for an element."""
    return element.canonical()
