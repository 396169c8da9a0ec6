"""Registered text extractors.

Mirrors the reference surface (text/classical.py:118-317, text/deep.py:
47-217): corpus-fit vectorizers (tfidf / bow / char-ngram) that override
``extract_dataset`` to fit before transforming, a sentence-embedding
extractor, and a BERT token-id extractor.

Offline notes: sentence-transformers / HF model weights cannot be
downloaded here (zero egress). text_sentence_embed therefore defaults to a
deterministic feature-hashing projection embedding (same 384-d output
contract); if a local HF model directory is supplied it is used instead.
text_bert_tokens uses a local tokenizer when given, else a stable
hash-based vocabulary with BERT-style special token ids.
"""

from __future__ import annotations

import hashlib
import re
from typing import Optional

import numpy as np

from .base import BaseFeatureExtractor, _collect
from .registry import register


def _doc_text(sample_path, kwargs) -> str:
    if kwargs.get("text") is not None:
        return str(kwargs["text"])
    if sample_path is not None:
        enc = kwargs.get("encoding") or "utf-8"
        return open(sample_path, "r", encoding=enc, errors="replace").read()
    raise ValueError("No text content: need 'text' metadata or a sample path.")


class _CorpusFitExtractor(BaseFeatureExtractor):
    """Stateful fit-then-transform base: extract() is valid only after
    extract_dataset() has fitted the vectorizer (reference design note
    text/classical.py:15-24)."""

    modality = "text"
    feature_type = "classical"

    def __init__(self) -> None:
        self._vectorizer = None

    def _build_vectorizer(self):
        raise NotImplementedError

    def extract(self, sample_path, **kwargs) -> np.ndarray:
        if self._vectorizer is None:
            raise RuntimeError(
                f"{self.name}: vectorizer not fitted. Run extract_dataset() first."
            )
        text = _doc_text(sample_path, kwargs)
        return np.asarray(self._vectorizer.transform([text]).todense(), dtype=np.float32)[0]

    def extract_dataset(self, loader, max_samples=None):
        texts, labels, metas = [], [], []
        label_to_idx: dict[str, int] = {}
        for i, (path, label, meta) in enumerate(loader):
            if max_samples is not None and i >= max_samples:
                break
            try:
                texts.append(_doc_text(path, meta))
            except Exception:
                continue
            metas.append(meta)
            if label is not None:
                if label not in label_to_idx:
                    label_to_idx[label] = len(label_to_idx)
                labels.append(label_to_idx[label])
        if not texts:
            raise RuntimeError("No features were successfully extracted.")
        self._vectorizer = self._build_vectorizer()
        X = self._vectorizer.fit_transform(texts)
        feats = [np.asarray(row.todense(), dtype=np.float32)[0] for row in X]
        return _collect(feats, labels, metas, label_to_idx, self.feature_type, self.modality)


@register
class TextTFIDFExtractor(_CorpusFitExtractor):
    name = "text_tfidf"

    def __init__(self, max_features: int = 10_000, ngram_range: tuple = (1, 2),
                 sublinear_tf: bool = True, min_df=2, max_df: float = 0.95) -> None:
        # knob set + defaults of reference text/classical.py:138-144
        super().__init__()
        self.max_features = max_features
        self.ngram_range = tuple(ngram_range)
        self.sublinear_tf = sublinear_tf
        self.min_df = min_df
        self.max_df = max_df

    def _build_vectorizer(self):
        from sklearn.feature_extraction.text import TfidfVectorizer

        return TfidfVectorizer(max_features=self.max_features, ngram_range=self.ngram_range,
                               sublinear_tf=self.sublinear_tf, min_df=self.min_df, max_df=self.max_df)


@register
class TextBOWExtractor(_CorpusFitExtractor):
    name = "text_bow"

    def __init__(self, max_features: int = 10_000, ngram_range: tuple = (1, 1),
                 binary: bool = False, min_df=2, max_df: float = 0.95) -> None:
        # knob set + defaults of reference text/classical.py:212-218
        super().__init__()
        self.max_features = max_features
        self.ngram_range = tuple(ngram_range)
        self.binary = binary
        self.min_df = min_df
        self.max_df = max_df

    def _build_vectorizer(self):
        from sklearn.feature_extraction.text import CountVectorizer

        return CountVectorizer(max_features=self.max_features, ngram_range=self.ngram_range,
                               binary=self.binary, min_df=self.min_df, max_df=self.max_df)


@register
class TextCharNgramExtractor(_CorpusFitExtractor):
    name = "text_char_ngram"

    def __init__(self, max_features: int = 50_000, ngram_range: tuple = (3, 5), min_df=3) -> None:
        # knob set + defaults of reference text/classical.py:279-287
        super().__init__()
        self.max_features = max_features
        self.ngram_range = tuple(ngram_range)
        self.min_df = min_df

    def _build_vectorizer(self):
        from sklearn.feature_extraction.text import TfidfVectorizer

        return TfidfVectorizer(analyzer="char_wb", max_features=self.max_features,
                               ngram_range=self.ngram_range, min_df=self.min_df)


_TOKEN_RE = re.compile(r"[a-z0-9']+")


def _hash_embed(text: str, dim: int) -> np.ndarray:
    """Deterministic feature-hashing embedding: each token hashes to a
    signed coordinate; L2-normalized bag-of-hashed-tokens."""
    v = np.zeros(dim, np.float32)
    for tok in _TOKEN_RE.findall(text.lower()):
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
        idx = h % dim
        sign = 1.0 if (h >> 63) & 1 else -1.0
        v[idx] += sign
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


@register
class TextSentenceEmbedding(BaseFeatureExtractor):
    """384-d sentence embedding (all-MiniLM-L6-v2 contract, reference
    text/deep.py:47-135). Three offline-graded backends:

    1. a local HF model dir when provided (true MiniLM semantics);
    2. corpus-fit **LSA** (TF-IDF -> TruncatedSVD -> L2 norm) on
       ``extract_dataset`` — real distributional semantics without egress;
    3. the deterministic hashing projection for unfitted single-sample use.
    """

    name = "text_sentence_embed"
    feature_type = "deep"
    modality = "text"

    def __init__(self, model_name: str = "all-MiniLM-L6-v2", dim: int = 384,
                 local_model_dir: Optional[str] = None, device: Optional[str] = None,
                 batch_size: int = 64, normalize_embeddings: bool = True) -> None:
        # device/batch_size/normalize_embeddings mirror reference
        # text/deep.py:85-90; device is advisory here (JAX places arrays)
        self.model_name = model_name
        self.dim = dim
        self.local_model_dir = local_model_dir
        self.device = device
        self.batch_size = batch_size
        self.normalize_embeddings = normalize_embeddings
        self._model = None
        self._lsa = None  # (vectorizer, svd) after corpus fit
        if local_model_dir:
            try:
                from transformers import AutoModel, AutoTokenizer

                self._tok = AutoTokenizer.from_pretrained(local_model_dir)
                self._model = AutoModel.from_pretrained(local_model_dir)
            except Exception:
                self._model = None

    def _hf_embed(self, text: str) -> np.ndarray:
        import torch

        with torch.no_grad():
            toks = self._tok(text, return_tensors="pt", truncation=True, max_length=256)
            out = self._model(**toks).last_hidden_state.mean(dim=1)[0]
        emb = out.numpy().astype(np.float32)
        n = np.linalg.norm(emb)
        return emb / n if n > 0 else emb

    def _pad_unit(self, rows: np.ndarray) -> np.ndarray:
        """Zero-pad to the contract dim; L2-normalize unless disabled."""
        out = np.zeros((len(rows), self.dim), np.float32)
        out[:, : rows.shape[1]] = rows
        if not self.normalize_embeddings:
            return out
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.where(norms > 0, norms, 1.0)

    def extract(self, sample_path, **kwargs) -> np.ndarray:
        text = _doc_text(sample_path, kwargs)
        if self._model is not None:
            return self._hf_embed(text)
        if self._lsa is not None:
            vec, svd = self._lsa
            return self._pad_unit(svd.transform(vec.transform([text])).astype(np.float32))[0]
        return _hash_embed(text, self.dim)

    def extract_dataset(self, loader, max_samples=None):
        if self._model is not None:
            return super().extract_dataset(loader, max_samples=max_samples)
        texts, labels, metas = [], [], []
        label_to_idx: dict[str, int] = {}
        for i, (path, label, meta) in enumerate(loader):
            if max_samples is not None and i >= max_samples:
                break
            try:
                texts.append(_doc_text(path, meta))
            except Exception:
                continue
            metas.append(meta)
            if label is not None:
                if label not in label_to_idx:
                    label_to_idx[label] = len(label_to_idx)
                labels.append(label_to_idx[label])
        if not texts:
            raise RuntimeError("No features were successfully extracted.")
        from sklearn.decomposition import TruncatedSVD
        from sklearn.feature_extraction.text import TfidfVectorizer

        vec = TfidfVectorizer(max_features=20000, ngram_range=(1, 2))
        X = vec.fit_transform(texts)
        k = min(self.dim, X.shape[0] - 1, X.shape[1] - 1)
        if k >= 2:
            svd = TruncatedSVD(n_components=k, random_state=42)
            rows = svd.fit_transform(X).astype(np.float32)
            self._lsa = (vec, svd)
            feats = list(self._pad_unit(rows))
        else:  # corpus too small for an SVD — hashing fallback
            feats = [_hash_embed(t, self.dim) for t in texts]
        return _collect(feats, labels, metas, label_to_idx, self.feature_type, self.modality)


@register
class TextBERTTokens(BaseFeatureExtractor):
    """Fixed-length token-id sequence (max_length,) (reference
    text/deep.py:136-217). Backends, best available first:

    1. a local HF tokenizer dir (true BERT ids);
    2. a corpus-fit frequency-ranked vocabulary built by
       ``extract_dataset`` — ids are dense and stable (rank order), OOV
       words fall into hash buckets above the fitted range;
    3. pure hash-bucket ids for unfitted single-sample use.

    All paths keep BERT framing conventions: [CLS]=101 / [SEP]=102 / [PAD]=0.
    """

    name = "text_bert_tokens"
    feature_type = "deep"
    modality = "text"

    _ID_BASE = 1000  # first non-special id (mirrors BERT's reserved block)

    def __init__(self, model_name: str = "bert-base-uncased", max_length: int = 128,
                 vocab_size: int = 30522, local_model_dir: Optional[str] = None,
                 return_attention_mask: bool = False) -> None:
        self.model_name = model_name
        self.max_length = max_length
        self.vocab_size = vocab_size
        self.return_attention_mask = return_attention_mask
        self._tok = None
        self._vocab: Optional[dict[str, int]] = None  # corpus-fit word -> id
        if local_model_dir:
            try:
                from transformers import AutoTokenizer

                self._tok = AutoTokenizer.from_pretrained(local_model_dir)
            except Exception:
                self._tok = None

    def _hash_id(self, tok: str) -> int:
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:4], "little")
        if self._vocab is not None:
            # OOV bucket range above the fitted vocabulary
            lo = self._ID_BASE + len(self._vocab)
            return lo + h % max(self.vocab_size - lo, 1)
        return self._ID_BASE + h % (self.vocab_size - self._ID_BASE)

    def _encode(self, text: str) -> np.ndarray:
        if self._tok is not None:
            enc = self._tok(text, truncation=True, max_length=self.max_length, padding="max_length")
            ids = np.asarray(enc["input_ids"], dtype=np.int32)
            if self.return_attention_mask:
                # (2, max_length): [ids, mask] — reference text/deep.py:195-198
                return np.stack([ids, np.asarray(enc["attention_mask"], dtype=np.int32)])
            return ids
        ids = [101]
        for tok in _TOKEN_RE.findall(text.lower())[: self.max_length - 2]:
            if self._vocab is not None and tok in self._vocab:
                ids.append(self._vocab[tok])
            else:
                ids.append(self._hash_id(tok))
        ids.append(102)
        ids = ids[: self.max_length] + [0] * max(0, self.max_length - len(ids))
        arr = np.asarray(ids, dtype=np.int32)
        if self.return_attention_mask:
            return np.stack([arr, (arr != 0).astype(np.int32)])
        return arr

    def extract(self, sample_path, **kwargs) -> np.ndarray:
        return self._encode(_doc_text(sample_path, kwargs))

    def extract_dataset(self, loader, max_samples=None):
        if self._tok is not None:
            return super().extract_dataset(loader, max_samples=max_samples)
        from collections import Counter

        texts, labels, metas = [], [], []
        label_to_idx: dict[str, int] = {}
        counts: Counter = Counter()
        for i, (path, label, meta) in enumerate(loader):
            if max_samples is not None and i >= max_samples:
                break
            try:
                text = _doc_text(path, meta)
            except Exception:
                continue
            texts.append(text)
            counts.update(_TOKEN_RE.findall(text.lower()))
            metas.append(meta)
            if label is not None:
                if label not in label_to_idx:
                    label_to_idx[label] = len(label_to_idx)
                labels.append(label_to_idx[label])
        if not texts:
            raise RuntimeError("No features were successfully extracted.")
        budget = max(self.vocab_size - self._ID_BASE - 1000, 1)  # keep an OOV bucket range
        ranked = [w for w, _ in counts.most_common(budget)]
        self._vocab = {w: self._ID_BASE + r for r, w in enumerate(ranked)}
        feats = [self._encode(t) for t in texts]
        return _collect(feats, labels, metas, label_to_idx, self.feature_type, self.modality)
