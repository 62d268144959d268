"""Typed report data model + text/HTML/JSON rendering.

Parity target: capitalone/datacompy ``report.py:50-331`` (frozen dataclass
tree ``ColumnSummary / RowSummary / ColumnComparison / MismatchStat(s) /
UniqueRowsData / ReportData``) and ``base.py:259-443`` (``build_report_data``
with per-call row-count caching, ``df_to_str`` display boundary).

All rendering is pure driver-side Python; the only executor work is the
``limit(n)`` sample pulls. Samples are sorted by join key before display so
output is deterministic under AQE (deliberate deviation from the reference's
unsorted ``limit`` noted in SURVEY §7.4).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from typing import TYPE_CHECKING, Any, Dict, List, Optional

if TYPE_CHECKING:
    from datacompy_spark.operators.compare import SparkCompare


@dataclass(frozen=True)
class ColumnSummary:
    common_columns: int
    df1_unq_columns: List[str]
    df2_unq_columns: List[str]
    df1_name: str
    df2_name: str


@dataclass(frozen=True)
class RowSummary:
    matched_on: List[str]
    abs_tol: Dict[str, float]
    rel_tol: Dict[str, float]
    df1_rows: int
    df2_rows: int
    common_rows: int
    df1_unq_rows: int
    df2_unq_rows: int
    unequal_rows: int
    matched_rows: int
    has_duplicates: bool = False


@dataclass(frozen=True)
class ColumnComparison:
    number_compared: int
    number_equal: int
    number_unequal: int


@dataclass(frozen=True)
class MismatchStat:
    column: str
    dtype1: str
    dtype2: str
    unequal_cnt: int
    max_diff: float
    null_diff: int
    sample: str = ""


@dataclass(frozen=True)
class UniqueRowsData:
    df_name: str
    count: int
    columns_shown: int
    total_columns: int
    sample: str = ""


@dataclass(frozen=True)
class ReportData:
    df1_name: str
    df2_name: str
    df1_shape: tuple
    df2_shape: tuple
    column_summary: ColumnSummary
    row_summary: RowSummary
    column_comparison: ColumnComparison
    mismatch_stats: List[MismatchStat] = field(default_factory=list)
    df1_unique: Optional[UniqueRowsData] = None
    df2_unique: Optional[UniqueRowsData] = None

    def to_dict(self) -> Dict[str, Any]:
        return asdict(self)

    def to_json(self, **kwargs) -> str:
        return json.dumps(self.to_dict(), default=str, **kwargs)

    def render(self, template_path: Optional[str] = None) -> str:
        """Plain-text report. With ``template_path``, renders that Jinja2
        template instead, passing the full report tree as ``report`` plus
        every top-level field (custom-template hook, ref ``base.py:493-533``)."""
        if template_path:
            import jinja2

            with open(template_path) as fh:
                template = jinja2.Template(fh.read())
            ctx = {f: getattr(self, f) for f in self.__dataclass_fields__}
            return template.render(report=self, **ctx)
        L: List[str] = []
        bar = "-" * 60

        def section(title: str) -> None:
            L.append("")
            L.append(title)
            L.append(bar)

        L.append("DataComPy-Spark Comparison")
        L.append("=" * 60)
        L.append("")
        L.append(f"DataFrame   Columns  Rows")
        L.append(f"{self.df1_name:<11} {self.df1_shape[1]:<8} {self.df1_shape[0]}")
        L.append(f"{self.df2_name:<11} {self.df2_shape[1]:<8} {self.df2_shape[0]}")

        cs = self.column_summary
        section("Column Summary")
        L.append(f"Number of columns in common: {cs.common_columns}")
        L.append(
            f"Columns only in {cs.df1_name}: {len(cs.df1_unq_columns)}"
            + (f" ({', '.join(cs.df1_unq_columns)})" if cs.df1_unq_columns else "")
        )
        L.append(
            f"Columns only in {cs.df2_name}: {len(cs.df2_unq_columns)}"
            + (f" ({', '.join(cs.df2_unq_columns)})" if cs.df2_unq_columns else "")
        )

        rs = self.row_summary
        section("Row Summary")
        L.append(f"Matched on: {', '.join(rs.matched_on)}")
        L.append(f"Any duplicates on match values: {'Yes' if rs.has_duplicates else 'No'}")
        L.append(f"Number of rows in common: {rs.common_rows}")
        L.append(f"Number of rows only in {self.df1_name}: {rs.df1_unq_rows}")
        L.append(f"Number of rows only in {self.df2_name}: {rs.df2_unq_rows}")
        L.append(f"Number of rows with some compared columns unequal: {rs.unequal_rows}")
        L.append(f"Number of rows with all compared columns equal: {rs.matched_rows}")

        cc = self.column_comparison
        section("Column Comparison")
        L.append(f"Number of columns compared with some values unequal: {cc.number_unequal}")
        L.append(f"Number of columns compared with all values equal: {cc.number_equal}")
        L.append(f"Total number of values which compare unequal: "
                 f"{sum(m.unequal_cnt for m in self.mismatch_stats)}")

        if self.mismatch_stats:
            section("Columns with Unequal Values or Types")
            header = f"{'Column':<24} {self.df1_name + ' dtype':<16} {self.df2_name + ' dtype':<16} {'# Unequal':>10} {'Max Diff':>12} {'# Null Diff':>12}"
            L.append(header)
            for m in self.mismatch_stats:
                L.append(
                    f"{m.column:<24} {m.dtype1:<16} {m.dtype2:<16} "
                    f"{m.unequal_cnt:>10} {m.max_diff:>12.5g} {m.null_diff:>12}"
                )
            for m in self.mismatch_stats:
                if m.sample:
                    section(f"Sample Rows with Unequal Values: {m.column}")
                    L.append(m.sample)

        for uq in (self.df1_unique, self.df2_unique):
            if uq and uq.count:
                section(f"Sample Rows Only in {uq.df_name} (First {uq.columns_shown} Columns)")
                L.append(uq.sample)

        L.append("")
        return "\n".join(L)

    def to_html(self) -> str:
        """HTML = text report in a <pre> block (ref ``base.py:674-691``)."""
        import html

        return (
            "<!DOCTYPE html><html><head><meta charset='utf-8'>"
            "<title>DataComPy-Spark Comparison</title></head><body><pre>"
            + html.escape(self.render())
            + "</pre></body></html>"
        )

    def save(self, path: str, fmt: str = "text") -> None:
        renderers = {"text": self.render, "html": self.to_html, "json": self.to_json}
        if fmt not in renderers:
            raise ValueError(f"unknown report format {fmt!r}")
        with open(path, "w") as fh:
            fh.write(renderers[fmt]())


def _df_to_str(df, sample_count: int, sort_cols: List[str]) -> str:
    """Display boundary: deterministic bounded sample → pandas → str
    (ref ``base.py:693-734``). Sorting before limit keeps snapshots stable."""
    present = [c for c in sort_cols if c in df.columns]
    if present:
        df = df.orderBy(*present)
    pdf = df.limit(sample_count).toPandas()
    if pdf.empty:
        return "(no rows)"
    return pdf.to_string(index=False)


def build_report_data(
    cmp: "SparkCompare", sample_count: int = 10, column_count: int = 10
) -> ReportData:
    """Assemble the full report tree from a finished comparison
    (ref ``base.py:259-403``). All counts come from the engine's single-agg
    statistics pass — no extra count actions here."""
    cmp._ensure_cached()  # sampling below makes several passes over the join
    n_both = cmp.intersect_rows_count
    matched = cmp.count_matching_rows()
    col_stats = cmp.column_stats

    column_summary = ColumnSummary(
        common_columns=len(cmp.intersect_columns()),
        df1_unq_columns=cmp.df1_unq_columns(),
        df2_unq_columns=cmp.df2_unq_columns(),
        df1_name=cmp.df1_name,
        df2_name=cmp.df2_name,
    )
    row_summary = RowSummary(
        matched_on=list(cmp.join_columns),
        abs_tol=dict(cmp.abs_tol),
        rel_tol=dict(cmp.rel_tol),
        df1_rows=cmp.df1_row_count,
        df2_rows=cmp.df2_row_count,
        common_rows=n_both,
        df1_unq_rows=cmp.df1_unq_rows_count,
        df2_unq_rows=cmp.df2_unq_rows_count,
        unequal_rows=n_both - matched,
        matched_rows=matched,
        has_duplicates=cmp.has_duplicates,
    )
    unequal_stats = [c for c in col_stats if not c["all_match"]]
    column_comparison = ColumnComparison(
        number_compared=len(col_stats),
        number_equal=len(col_stats) - len(unequal_stats),
        number_unequal=len(unequal_stats),
    )
    mismatch_stats = []
    for c in unequal_stats:
        sample = ""
        if c["unequal_cnt"] > 0:
            n = min(sample_count, c["unequal_cnt"])
            sample = _df_to_str(
                cmp.sample_mismatch(c["column"], n, for_display=True),
                n,
                list(cmp.join_columns),
            )
        mismatch_stats.append(
            MismatchStat(
                column=c["column"],
                dtype1=c["dtype1"],
                dtype2=c["dtype2"],
                unequal_cnt=c["unequal_cnt"],
                max_diff=c["max_diff"],
                null_diff=c["null_diff"],
                sample=sample,
            )
        )

    def unique_data(name: str, df, count: int) -> Optional[UniqueRowsData]:
        if count == 0:
            return None
        shown = df.columns[:column_count]  # first-n-columns cap (ref base.py:375-388)
        return UniqueRowsData(
            df_name=name,
            count=count,
            columns_shown=len(shown),
            total_columns=len(df.columns),
            sample=_df_to_str(
                df.select(*shown), sample_count, list(cmp.join_columns)
            ),
        )

    return ReportData(
        df1_name=cmp.df1_name,
        df2_name=cmp.df2_name,
        df1_shape=(cmp.df1_row_count, len(cmp.df1.columns)),
        df2_shape=(cmp.df2_row_count, len(cmp.df2.columns)),
        column_summary=column_summary,
        row_summary=row_summary,
        column_comparison=column_comparison,
        mismatch_stats=mismatch_stats,
        df1_unique=unique_data(cmp.df1_name, cmp.df1_unq_rows, cmp.df1_unq_rows_count),
        df2_unique=unique_data(cmp.df2_name, cmp.df2_unq_rows, cmp.df2_unq_rows_count),
    )
