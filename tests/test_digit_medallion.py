"""Reference-conformance: replay of the digit silver/gold transform rules
(docs/SILVER_API_DIGIT_TRANSFORMACAO.md, gold_digit_fixed.py) on dirty
bronze-shaped fixtures (FIXTURES.md §2)."""

import json
from datetime import datetime

import pyarrow as pa

from aws_medallion_datalake_ray.pipelines import digit

RUN_TS = datetime(2024, 1, 1)


def test_silver_horas_funcao():
    bronze = pa.table(
        {
            "CodigoCargo": ["10", "11", "12"],
            "DescricaoCargo": [" Pedreiro ", "Servente", "Mestre"],
            "TotalHoras": ["120.5", "not-a-number", "80"],
            "codigo_obra": ["O1", None, "O3"],
            "data_referencia": ["2024-01", "2024-01", "2024-02"],
            "extraction_timestamp": ["1700000000", "1700000000", "1700000001"],
        }
    )
    out = digit.silver_horas_funcao(bronze)
    assert out.num_rows == 2  # null codigo_obra filtered
    assert out["descricao_cargo"].to_pylist()[0] == "Pedreiro"
    assert out["total_horas"].to_pylist() == [120.5, 80.0]
    assert out["extraction_timestamp"].to_pylist()[0].year == 2023


def test_silver_obras():
    bronze = pa.table(
        {
            "CodigoObra": ["O1", "", "O2", "O1"],
            "DescricaoObra": ["Torre A", "x", None, "Torre A"],
            "endereco": [None, "r", "Av. B", None],
            "datainicio": ["0000-00-00", "2024-01-01", "2023-05-01", "0000-00-00"],
            "datafim": ["2025-01-01", "", "0000-00-00", "2025-01-01"],
            "tipologia": ["res", "c", None, "res"],
        }
    )
    out = digit.silver_obras(bronze)
    assert out.num_rows == 3  # empty key dropped (dups removed dataset-level)
    r = out.to_pylist()[0]
    assert r["endereco"] == ""  # coalesce
    assert r["data_inicio"] is None  # invalid date
    assert r["data_fim"] == "2025-01-01"


def test_silver_funcionarios():
    bronze = pa.table(
        {
            "CodigoFuncionario": ["F1", "F2"],
            "NomeCompleto": ["Jo\tão\nSilva", "Maria"],
            "CPF": ["123.456.789-00", "987"],
            "PIS": ["1.2.3", None],
            "DataNascimento": ["1990-01-01", "0000-00-00"],
            "ativo": ["S", "N"],
        }
    )
    out = digit.silver_funcionarios(bronze)
    assert out["nome_completo"].to_pylist()[0] == "JoãoSilva"
    assert out["cpf"].to_pylist()[0] == "12345678900"
    assert out["ativo"].to_pylist() == [True, False]
    assert out["data_nascimento"].to_pylist()[1] is None


def test_silver_cargos_trim_and_null_obra():
    bronze = pa.table(
        {
            "CodigoCargo": ["C1", "C2", None],
            "DescricaoCargo": ["  Eng  ", "Aux", "X"],
            "CodigoObra": ["O1", "", "O9"],
        }
    )
    out = digit.silver_cargos(bronze)
    assert out.num_rows == 2
    assert out["descricao_cargo"].to_pylist() == ["Eng", "Aux"]
    assert out["codigo_obra"].to_pylist() == ["O1", None]


def test_silver_resumo_periodo_casts():
    bronze = pa.table(
        {
            "obra_id": ["O1"],
            "totalHoras": ["1234.5"],
            "totalFuncionarios": ["42"],
            "diasPeriodo": ["30"],
            "extraction_timestamp": ["1700000000"],
        }
    )
    out = digit.silver_resumo_periodo(bronze)
    r = out.to_pylist()[0]
    assert (r["total_horas"], r["total_funcionarios"], r["dias_periodo"]) == (1234.5, 42, 30)


def test_silver_relatorio_expandido_explode():
    bronze = pa.table(
        {
            "obra_id": ["O1", "O2"],
            "CodigoCargo": ["C1", "C2"],
            "Funcionarios": [
                json.dumps(
                    [
                        {"CodigoFuncionario": "F1", "NomeCompleto": "A\tB", "HorasTrabalhadas": 8},
                        {"CodigoFuncionario": "F2", "NomeCompleto": "C", "HorasTrabalhadas": 7.5},
                    ]
                ),
                "[]",
            ],
        }
    )
    out = digit.silver_relatorio_expandido(bronze)
    assert out.num_rows == 2
    assert out["obra_id"].to_pylist() == ["O1", "O1"]
    assert out["nome_completo"].to_pylist() == ["AB", "C"]
    assert out["horas_trabalhadas"].to_pylist() == [8.0, 7.5]


def test_dim_tempo_and_fato():
    dates = pa.array(["2024-08-17", "2024-08-17", "2024-02-01", None])
    dim = digit.dim_tempo(dates, RUN_TS)
    assert dim.num_rows == 2
    by_key = {r["data_key"]: r for r in dim.to_pylist()}
    assert by_key["2024-08-17"]["eh_fim_semana"] is True
    assert by_key["2024-02-01"]["trimestre"] == 1
    assert by_key["2024-02-01"]["semestre"] == 1
    # GOLD doc :42-47: nomes por extenso
    assert by_key["2024-08-17"]["nome_mes"] == "agosto"
    assert by_key["2024-08-17"]["nome_dia_semana"] == "sábado"
    assert by_key["2024-02-01"]["nome_mes"] == "fevereiro"

    horas = pa.table(
        {
            "codigo_obra": ["O1"],
            "codigo_cargo": ["C1"],
            "data_referencia": ["2024-08-17"],
            "total_horas": [8.0],
        }
    )
    fato = digit.fato_horas_trabalhadas(horas, RUN_TS)
    assert fato.column_names == [
        "obra_key",
        "cargo_key",
        "data_key",
        "total_horas",
        "data_processamento",
    ]
    assert fato["data_processamento"].to_pylist()[0] == RUN_TS


def test_dim_obras_conformance():
    """Column-for-column vs gold_digit_fixed.py:34-51 (obra_key, codigo_obra,
    nome_obra, endereco, data_atualizacao) with .distinct() semantics."""
    silver = pa.table(
        {
            "codigo_obra": ["O1", "O1", "O2"],
            "descricao_obra": ["Torre A", "Torre A", "Torre B"],
            "endereco": ["Rua 1", "Rua 1", "Av. 2"],
            "data_inicio": ["2024-01-01", "2024-01-01", None],
            "data_fim": [None, None, None],
            "tipologia": ["res", "res", "com"],
        }
    )
    dim = digit.dim_obras(silver, RUN_TS)
    assert dim.column_names == [
        "obra_key", "codigo_obra", "nome_obra", "endereco", "data_atualizacao",
    ]
    assert dim.num_rows == 2  # distinct collapsed the duplicate
    by_key = {r["obra_key"]: r for r in dim.to_pylist()}
    assert by_key["O1"]["nome_obra"] == "Torre A"
    assert by_key["O2"]["endereco"] == "Av. 2"
    assert by_key["O1"]["data_atualizacao"] == RUN_TS


def test_dim_funcionarios_conformance():
    """vs gold_digit_fixed.py:53-69."""
    silver = pa.table(
        {
            "codigo_funcionario": ["F1", "F2", "F1"],
            "nome_completo": ["Ana", "Bruno", "Ana"],
            "cpf": ["1", "2", "1"],
        }
    )
    dim = digit.dim_funcionarios(silver, RUN_TS)
    assert dim.column_names == [
        "funcionario_key", "codigo_funcionario", "nome_completo", "data_atualizacao",
    ]
    assert dim.num_rows == 2


def test_dim_cargos_conformance():
    """vs gold_digit_fixed.py:71-87."""
    silver = pa.table(
        {
            "codigo_cargo": ["C1", "C2", "C2"],
            "descricao_cargo": ["Eng", "Aux", "Aux"],
            "codigo_obra": ["O1", None, None],
        }
    )
    dim = digit.dim_cargos(silver, RUN_TS)
    assert dim.column_names == [
        "cargo_key", "codigo_cargo", "nome_cargo", "data_atualizacao",
    ]
    assert dim.num_rows == 2
    by_key = {r["cargo_key"]: r for r in dim.to_pylist()}
    assert by_key["C2"]["nome_cargo"] == "Aux"


def test_fato_resumo_obras_conformance():
    """vs gold_digit_fixed.py:132-146: pass-through + gold stamp + obra_key."""
    silver = pa.table(
        {
            "obra_id": ["O1"],
            "total_horas": [100.0],
            "total_funcionarios": [5],
            "dias_periodo": [30],
        }
    )
    fato = digit.fato_resumo_obras(silver, RUN_TS)
    assert fato.column_names == [
        "obra_id", "total_horas", "total_funcionarios", "dias_periodo",
        "obra_key", "data_processamento_gold",
    ]
    assert fato["obra_key"].to_pylist() == ["O1"]
    assert fato["data_processamento_gold"].to_pylist()[0] == RUN_TS
