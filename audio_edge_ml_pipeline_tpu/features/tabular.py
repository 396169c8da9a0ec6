"""Registered tabular extractors.

Mirrors the reference surface (tabular/classical.py:72-315, tabular/deep.py:
48-177): a stateful ColumnTransformer pipeline (impute+scale numerics,
impute+one-hot categoricals, expand datetime columns) and a polynomial
variant that adds degree-2 interactions on the numeric block.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .base import BaseFeatureExtractor, _collect
from .registry import register


def _expand_datetimes(df):
    """Replace datetime-like columns with year/month/day/dayofweek/hour."""
    import pandas as pd

    out = df.copy()
    for col in list(out.columns):
        s = out[col]
        if s.dtype == object:
            try:
                parsed = pd.to_datetime(s, errors="raise", format="mixed")
                if parsed.notna().mean() > 0.9:
                    out[col + "__year"] = parsed.dt.year
                    out[col + "__month"] = parsed.dt.month
                    out[col + "__day"] = parsed.dt.day
                    out[col + "__dow"] = parsed.dt.dayofweek
                    out[col + "__hour"] = parsed.dt.hour
                    out = out.drop(columns=[col])
            except Exception:
                pass
        elif str(s.dtype).startswith("datetime"):
            out[col + "__year"] = s.dt.year
            out[col + "__month"] = s.dt.month
            out[col + "__day"] = s.dt.day
            out[col + "__dow"] = s.dt.dayofweek
            out[col + "__hour"] = s.dt.hour
            out = out.drop(columns=[col])
    return out


@register
class TabularClassicalExtractor(BaseFeatureExtractor):
    """Impute+scale numerics, impute+OHE categoricals, datetime expansion.
    Stateful: fitted on the full dataset in extract_dataset; extract() valid
    post-fit only (reference tabular/classical.py:11-46)."""

    name = "tabular_classical"
    feature_type = "classical"
    modality = "tabular"

    _SCALERS = ("standard", "minmax", "robust", "none")

    def __init__(self, numerical_cols: Optional[list] = None,
                 categorical_cols: Optional[list] = None,
                 label_col: Optional[str] = None, scaler: str = "standard",
                 impute_numerical: str = "median",
                 impute_categorical: str = "most_frequent",
                 max_ohe_categories: Optional[int] = None,
                 max_onehot_cardinality: int = 50) -> None:
        # knob set of reference tabular/classical.py:104-120;
        # max_onehot_cardinality kept as an alias of max_ohe_categories
        if scaler not in self._SCALERS:
            raise ValueError(f"scaler must be one of {list(self._SCALERS)}, got {scaler!r}.")
        self.numerical_cols = list(numerical_cols) if numerical_cols else None
        self.categorical_cols = list(categorical_cols) if categorical_cols else None
        self.label_col = label_col
        self.scaler = scaler
        self.impute_numerical = impute_numerical
        self.impute_categorical = impute_categorical
        self.max_onehot_cardinality = (
            max_ohe_categories if max_ohe_categories is not None else max_onehot_cardinality
        )
        self.max_ohe_categories = self.max_onehot_cardinality
        self._transformer = None
        self._columns: Optional[list[str]] = None

    def _make_scaler(self):
        from sklearn.preprocessing import MinMaxScaler, RobustScaler, StandardScaler

        return {"standard": StandardScaler, "minmax": MinMaxScaler, "robust": RobustScaler}[self.scaler]()

    def _split_columns(self, df):
        from pandas.api.types import is_numeric_dtype

        if self.numerical_cols is not None:
            num_cols = [c for c in self.numerical_cols if c in df.columns]
        else:
            num_cols = [c for c in df.columns if is_numeric_dtype(df[c]) and c != self.label_col]
        if self.categorical_cols is not None:
            cat_cols = [c for c in self.categorical_cols if c in df.columns]
        else:
            cat_cols = [
                c for c in df.columns
                if c not in num_cols and c != self.label_col
                and df[c].nunique() <= self.max_onehot_cardinality
            ]
        return num_cols, cat_cols

    def _build_transformer(self, df):
        from sklearn.compose import ColumnTransformer
        from sklearn.impute import SimpleImputer
        from sklearn.pipeline import Pipeline
        from sklearn.preprocessing import OneHotEncoder

        num_cols, cat_cols = self._split_columns(df)
        num_steps = [("impute", SimpleImputer(strategy=self.impute_numerical))]
        if self.scaler != "none":
            num_steps.append(("scale", self._make_scaler()))
        num_pipe = Pipeline(num_steps)
        cat_pipe = Pipeline(
            [
                ("impute", SimpleImputer(strategy=self.impute_categorical)),
                ("ohe", OneHotEncoder(handle_unknown="ignore", sparse_output=False)),
            ]
        )
        return ColumnTransformer([("num", num_pipe, num_cols), ("cat", cat_pipe, cat_cols)]), num_cols, cat_cols

    def _row_frame(self, kwargs):
        import pandas as pd

        row = {k: v for k, v in kwargs.items() if not k.startswith("_")}
        return _expand_datetimes(pd.DataFrame([row]))

    def extract(self, sample_path, **kwargs) -> np.ndarray:
        if self._transformer is None:
            raise RuntimeError(f"{self.name}: not fitted. Run extract_dataset() first.")
        df = self._row_frame(kwargs)
        for c in self._columns:
            if c not in df.columns:
                df[c] = np.nan
        return np.asarray(self._transformer.transform(df[self._columns]), dtype=np.float32)[0]

    def extract_dataset(self, loader, max_samples=None):
        import pandas as pd

        rows, labels, metas = [], [], []
        label_to_idx: dict[str, int] = {}
        for i, (path, label, meta) in enumerate(loader):
            if max_samples is not None and i >= max_samples:
                break
            rows.append({k: v for k, v in meta.items() if not k.startswith("_")})
            metas.append(meta)
            if label is not None:
                if label not in label_to_idx:
                    label_to_idx[label] = len(label_to_idx)
                labels.append(label_to_idx[label])
        if not rows:
            raise RuntimeError("No features were successfully extracted.")
        df = _expand_datetimes(pd.DataFrame(rows))
        self._transformer, num_cols, cat_cols = self._build_transformer(df)
        self._columns = num_cols + cat_cols
        X = self._transformer.fit_transform(df[self._columns])
        feats = [np.asarray(X[i], dtype=np.float32) for i in range(len(rows))]
        return _collect(feats, labels, metas, label_to_idx, self.feature_type, self.modality)


@register
class TabularPolynomialExtractor(TabularClassicalExtractor):
    """Adds degree-2 PolynomialFeatures on the numeric block only
    (reference tabular/deep.py:18-26)."""

    name = "tabular_polynomial"
    feature_type = "deep"

    def __init__(self, degree: int = 2, interaction_only: bool = False,
                 include_bias: bool = False, **kwargs) -> None:
        # polynomial knobs of reference tabular/deep.py:79-92; the shared
        # column/impute/scaler knobs pass through to the base class
        super().__init__(**kwargs)
        self.degree = degree
        self.interaction_only = interaction_only
        self.include_bias = include_bias

    def _build_transformer(self, df):
        from sklearn.compose import ColumnTransformer
        from sklearn.impute import SimpleImputer
        from sklearn.pipeline import Pipeline
        from sklearn.preprocessing import OneHotEncoder, PolynomialFeatures

        num_cols, cat_cols = self._split_columns(df)
        num_steps = [("impute", SimpleImputer(strategy=self.impute_numerical))]
        if self.scaler != "none":
            num_steps.append(("scale", self._make_scaler()))
        num_steps.append(
            ("poly", PolynomialFeatures(degree=self.degree, interaction_only=self.interaction_only,
                                        include_bias=self.include_bias))
        )
        num_pipe = Pipeline(num_steps)
        cat_pipe = Pipeline(
            [
                ("impute", SimpleImputer(strategy=self.impute_categorical)),
                ("ohe", OneHotEncoder(handle_unknown="ignore", sparse_output=False)),
            ]
        )
        return ColumnTransformer([("num", num_pipe, num_cols), ("cat", cat_pipe, cat_cols)]), num_cols, cat_cols
