"""Character tokenizer / vocabulary.

Reference-side realization: a Python dict mapping characters to label
ids [SURVEY.md §2.1 #2, INFERRED-high]. CTC requires a blank symbol and
the attention decoder requires sos/eos [BASELINE.json:L7,L9].

Id layout (deterministic, serialized with checkpoints):
  0 = <blank>   (CTC blank; also the label-pad id — always masked)
  1 = <unk>
  2 = <sos>
  3 = <eos>
  4.. = alphabet, sorted
"""

from __future__ import annotations

import hashlib
import json
from typing import Dict, Iterable, List, Sequence

BLANK = "<blank>"
UNK = "<unk>"
SOS = "<sos>"
EOS = "<eos>"

DEFAULT_ALPHABET = " 'abcdefghijklmnopqrstuvwxyz"


class CharTokenizer:
    """Maps transcripts to int label sequences and back."""

    def __init__(self, alphabet: str = DEFAULT_ALPHABET):
        self.specials = [BLANK, UNK, SOS, EOS]
        self.alphabet = "".join(sorted(set(alphabet)))
        self.itos: List[str] = list(self.specials) + list(self.alphabet)
        self.stoi: Dict[str, int] = {s: i for i, s in enumerate(self.itos)}

    # --- special ids -----------------------------------------------------
    @property
    def blank_id(self) -> int:
        return self.stoi[BLANK]

    @property
    def unk_id(self) -> int:
        return self.stoi[UNK]

    @property
    def sos_id(self) -> int:
        return self.stoi[SOS]

    @property
    def eos_id(self) -> int:
        return self.stoi[EOS]

    @property
    def pad_id(self) -> int:
        # Labels are padded with blank and masked by length everywhere.
        return self.blank_id

    @property
    def vocab_size(self) -> int:
        return len(self.itos)

    # --- encode / decode --------------------------------------------------
    def encode(self, text: str) -> List[int]:
        text = text.lower()
        return [self.stoi.get(ch, self.unk_id) for ch in text]

    def decode(self, ids: Sequence[int]) -> str:
        out = []
        for i in ids:
            i = int(i)
            if i in (self.blank_id, self.sos_id, self.eos_id):
                continue
            out.append(self.itos[i] if 0 <= i < len(self.itos) else UNK)
        return "".join(out)

    @classmethod
    def build_from_texts(cls, texts: Iterable[str]) -> "CharTokenizer":
        chars = set()
        for t in texts:
            chars.update(t.lower())
        return cls("".join(sorted(chars)))

    # --- serialization (stored beside checkpoints) -------------------------
    def to_json(self) -> str:
        return json.dumps({"alphabet": self.alphabet})

    @classmethod
    def from_json(cls, blob: str) -> "CharTokenizer":
        return cls(json.loads(blob)["alphabet"])

    def fingerprint(self) -> str:
        return hashlib.sha256(self.to_json().encode()).hexdigest()[:16]
