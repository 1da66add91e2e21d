"""Reference-conformance medallion transforms — the "digit" table family.

Column-for-column replay of the reference's silver cleaning rules
(``scripts/silver_digit_clean.py:59-116``; normative spec
``docs/SILVER_API_DIGIT_TRANSFORMACAO.md:8-103``) and gold star schema
(``scripts/gold_digit_fixed.py:34-146``; spec
``docs/GOLD_API_DIGIT_STAR_SCHEMA.md:18-72``) on the FIXTURES.md §2 bronze
shapes (all-string columns with injected dirt).  Exercised by
``tests/test_digit_medallion.py``; each transform is a pure pa.Table batch
function usable directly inside ``map_batches(batch_format="pyarrow")``.
"""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import pyarrow.compute as pc

from aws_medallion_datalake_ray.functions import cleaning as cl

# ------------------------------------------------------------------ silver


def silver_horas_funcao(batch: pa.Table) -> pa.Table:
    """ref silver_digit_clean.py:69-81: select/cast/trim + null-key filter."""
    out = pa.table(
        {
            "codigo_cargo": pc.cast(batch["CodigoCargo"], pa.string()),
            "descricao_cargo": cl.trim(batch["DescricaoCargo"]),
            "total_horas": cl.typed_projection(
                batch, [("TotalHoras", "total_horas", pa.float64())]
            )["total_horas"],
            "codigo_obra": batch["codigo_obra"],
            "data_referencia": batch["data_referencia"],
            "extraction_timestamp": cl.epoch_to_timestamp(batch["extraction_timestamp"]),
        }
    )
    return cl.drop_null_keys(out, ["codigo_obra"])


def silver_obras(batch: pa.Table) -> pa.Table:
    """ref silver_digit_clean.py:83-90 + doc rules :8-19 (coalesce, invalid
    date -> null, null-key filter; distinct applied dataset-level)."""
    out = pa.table(
        {
            "codigo_obra": batch["CodigoObra"],
            "descricao_obra": cl.coalesce_default(batch["DescricaoObra"]),
            "endereco": cl.coalesce_default(batch["endereco"]),
            "data_inicio": cl.invalid_date_to_null(batch["datainicio"]),
            "data_fim": cl.invalid_date_to_null(batch["datafim"]),
            "tipologia": cl.coalesce_default(batch["tipologia"]),
        }
    )
    return cl.drop_null_keys(out, ["codigo_obra"])


def silver_funcionarios(batch: pa.Table) -> pa.Table:
    """ref silver_digit_clean.py:92-98 + doc :21-32 (scrub, digits-only CPF/PIS,
    S/N -> bool)."""
    out = pa.table(
        {
            "codigo_funcionario": batch["CodigoFuncionario"],
            "nome_completo": cl.scrub_control_chars(cl.coalesce_default(batch["NomeCompleto"])),
            "cpf": cl.digits_only(cl.coalesce_default(batch["CPF"])),
            "pis": cl.digits_only(cl.coalesce_default(batch["PIS"])),
            "data_nascimento": cl.invalid_date_to_null(batch["DataNascimento"]),
            "ativo": cl.flag_to_bool(batch["ativo"]),
        }
    )
    return cl.drop_null_keys(out, ["codigo_funcionario"])


def silver_cargos(batch: pa.Table) -> pa.Table:
    """ref silver_digit_clean.py:100-106 + doc :34-42 (trim descricao)."""
    empty_to_null = pc.if_else(
        pc.equal(cl.coalesce_default(batch["CodigoObra"]), ""),
        pa.scalar(None, pa.string()),
        batch["CodigoObra"],
    )
    out = pa.table(
        {
            "codigo_cargo": batch["CodigoCargo"],
            "descricao_cargo": cl.trim(cl.coalesce_default(batch["DescricaoCargo"])),
            "codigo_obra": empty_to_null,
        }
    )
    return cl.drop_null_keys(out, ["codigo_cargo"])


def silver_resumo_periodo(batch: pa.Table) -> pa.Table:
    """ref doc :56-66 / DDL silver_digit_clean.py:203-211 (double/int casts)."""
    casts = cl.typed_projection(
        batch,
        [
            ("obra_id", "obra_id", pa.string()),
            ("totalHoras", "total_horas", pa.float64()),
            ("totalFuncionarios", "total_funcionarios", pa.int64()),
            ("diasPeriodo", "dias_periodo", pa.int64()),
        ],
    )
    out = casts.append_column(
        "extraction_timestamp", cl.epoch_to_timestamp(batch["extraction_timestamp"])
    )
    return cl.drop_null_keys(out, ["obra_id"])


def silver_relatorio_expandido(batch: pa.Table) -> pa.Table:
    """ref doc :68-79: explode the Funcionarios JSON array into worker rows."""
    out = cl.explode_json_array(
        batch,
        "Funcionarios",
        ["CodigoFuncionario", "NomeCompleto", "HorasTrabalhadas"],
        ["obra_id", "CodigoCargo"],
    )
    return pa.table(
        {
            "obra_id": out["obra_id"],
            "codigo_cargo": out["CodigoCargo"],
            "codigo_funcionario": out["CodigoFuncionario"],
            "nome_completo": cl.scrub_control_chars(cl.coalesce_default(out["NomeCompleto"])),
            "horas_trabalhadas": cl.typed_projection(
                out, [("HorasTrabalhadas", "h", pa.float64())]
            )["h"],
        }
    )


# ------------------------------------------------------------------ gold


def _distinct(t: pa.Table) -> pa.Table:
    """Whole-row distinct (small dim tables; dataset-level callers use
    exact_dedup for the distributed variant)."""
    return t.group_by(t.column_names).aggregate([]).select(t.column_names)


def dim_obras(silver: pa.Table, run_ts: datetime) -> pa.Table:
    """ref gold_digit_fixed.py:34-51 / doc GOLD :18-26: obra dimension —
    distinct (obra_key, codigo_obra, nome_obra, endereco) + refresh stamp."""
    t = _distinct(
        pa.table(
            {
                "obra_key": silver["codigo_obra"],
                "codigo_obra": silver["codigo_obra"],
                "nome_obra": silver["descricao_obra"],
                "endereco": silver["endereco"],
            }
        )
    )
    return cl.stamp_run_ts(t, "data_atualizacao", run_ts)


def dim_funcionarios(silver: pa.Table, run_ts: datetime) -> pa.Table:
    """ref gold_digit_fixed.py:53-69 / doc GOLD :28-34: funcionario dim."""
    t = _distinct(
        pa.table(
            {
                "funcionario_key": silver["codigo_funcionario"],
                "codigo_funcionario": silver["codigo_funcionario"],
                "nome_completo": silver["nome_completo"],
            }
        )
    )
    return cl.stamp_run_ts(t, "data_atualizacao", run_ts)


def dim_cargos(silver: pa.Table, run_ts: datetime) -> pa.Table:
    """ref gold_digit_fixed.py:71-87 / doc GOLD :36-40: cargo dim."""
    t = _distinct(
        pa.table(
            {
                "cargo_key": silver["codigo_cargo"],
                "codigo_cargo": silver["codigo_cargo"],
                "nome_cargo": silver["descricao_cargo"],
            }
        )
    )
    return cl.stamp_run_ts(t, "data_atualizacao", run_ts)


def fato_resumo_obras(silver_resumo: pa.Table, run_ts: datetime) -> pa.Table:
    """ref gold_digit_fixed.py:132-146: pass-through aggregate fact with a
    gold processing stamp (obra_id doubles as the obra_key join column, cf.
    sql/athena_gold_queries.sql:75-84)."""
    t = silver_resumo.append_column(
        "obra_key", silver_resumo["obra_id"]
    )
    return cl.stamp_run_ts(t, "data_processamento_gold", run_ts)


def dim_tempo(dates: pa.Array, run_ts: datetime) -> pa.Table:
    """ref gold_digit_fixed.py:99-107 / doc GOLD :42-47: distinct dates ->
    calendar attributes."""
    uniq = pc.unique(dates)
    uniq = uniq.filter(pc.is_valid(uniq))
    ts = pc.cast(uniq, pa.timestamp("us"))
    parts = cl.date_parts(ts)
    t = pa.table({"data_key": uniq, **{k: v for k, v in parts.items()}})
    return cl.stamp_run_ts(t, "data_processamento", run_ts)


def fato_horas_trabalhadas(silver_horas: pa.Table, run_ts: datetime) -> pa.Table:
    """ref gold_digit_fixed.py:109-128: fact keeps natural keys + measures."""
    t = pa.table(
        {
            "obra_key": silver_horas["codigo_obra"],
            "cargo_key": silver_horas["codigo_cargo"],
            "data_key": silver_horas["data_referencia"],
            "total_horas": silver_horas["total_horas"],
        }
    )
    return cl.stamp_run_ts(t, "data_processamento", run_ts)
