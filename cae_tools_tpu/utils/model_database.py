"""Sqlite experiment tracker.

Schema-compatible with the reference (``utils/model_database.py:9-39``):
``MODEL_SCHEMA`` (version), ``MODEL_TRAINING`` (13 columns) and
``MODEL_EVALUATIONS`` (5 columns), rows keyed by model_id with
hyperparameters/spec/metrics stored as JSON strings, so databases written by
either implementation are queryable by the other.
"""

from __future__ import annotations

import datetime
import json
import os
import sqlite3

SCHEMA_VERSION = "0.1"


class ModelDatabase:
    def __init__(self, database_path):
        exists = os.path.exists(database_path)
        self.conn = sqlite3.connect(database_path)
        if not exists:
            curs = self.conn.cursor()
            curs.execute("CREATE TABLE MODEL_SCHEMA(version STRING)")
            curs.execute("INSERT INTO MODEL_SCHEMA VALUES (?)", (SCHEMA_VERSION,))
            curs.execute(
                "CREATE TABLE MODEL_TRAINING("
                "timestamp DATE, model_id STRING, model_type STRING, "
                "target_variable STRING, input_variables STRING, "
                "model_description STRING, model_path STRING, "
                "train_path STRING, train_loss FLOAT, "
                "test_path STRING, test_loss FLOAT, "
                "hyperparameters STRING, spec STRING)"
            )
            curs.execute(
                "CREATE TABLE MODEL_EVALUATIONS("
                "timestamp DATE, model_id STRING, train_path STRING, "
                "test_path STRING, metrics STRING)"
            )
            self.conn.commit()

    def add_training_result(
        self,
        model_id,
        model_type,
        target_variable,
        input_variables,
        description,
        model_path,
        train_path,
        train_loss,
        test_path,
        test_loss,
        hyperparameters,
        spec,
    ):
        curs = self.conn.cursor()
        curs.execute(
            "INSERT INTO MODEL_TRAINING VALUES(?,?,?,?,?,?,?,?,?,?,?,?,?)",
            (
                datetime.datetime.now().isoformat(sep=" "),
                model_id,
                model_type,
                target_variable,
                json.dumps(input_variables),
                description,
                model_path,
                train_path,
                train_loss,
                test_path,
                test_loss,
                json.dumps(hyperparameters),
                json.dumps(spec),
            ),
        )
        self.conn.commit()

    def add_evaluation_result(self, model_id, train_path, test_path, metrics):
        curs = self.conn.cursor()
        curs.execute(
            "INSERT INTO MODEL_EVALUATIONS VALUES(?,?,?,?,?)",
            (
                datetime.datetime.now().isoformat(sep=" "),
                model_id,
                train_path,
                test_path,
                json.dumps(metrics),
            ),
        )
        self.conn.commit()

    # ---- query helpers ----------------------------------------------------
    def _rows(self, curs):
        names = [c[0] for c in curs.description]
        return [dict(zip(names, row)) for row in curs.fetchall()]

    def list_models(self):
        curs = self.conn.cursor()
        return self._rows(
            curs.execute("SELECT * FROM MODEL_TRAINING ORDER BY test_loss ASC")
        )

    def list_evaluations(self, model_id):
        curs = self.conn.cursor()
        return self._rows(
            curs.execute(
                "SELECT * FROM MODEL_EVALUATIONS WHERE model_id=?", [model_id]
            )
        )

    # ---- pretty printers (query_database CLI surface) ---------------------
    def _fmt_training(self, row):
        input_vars = json.loads(row["input_variables"])
        return {
            "model_id": row["model_id"],
            "model_type": row["model_type"],
            "input_variables": ", ".join(input_vars),
            "test_loss": "%0.2f" % row["test_loss"],
            "train_loss": "%0.2f" % row["train_loss"],
        }

    def _fmt_evaluation(self, row):
        metrics = json.loads(row["metrics"])
        return {
            "model_id": row["model_id"],
            "test_mse": "%0.2f" % metrics["test"]["mse"],
            "train_mse": "%0.2f" % metrics["train"]["mse"],
            "test_mae": "%0.2f" % metrics["test"]["mae"],
            "train_mae": "%0.2f" % metrics["train"]["mae"],
        }

    def _print_row(self, training_row, evaluation_row=None):
        get = lambda d, k: (d or {}).get(k, "")
        print(
            f"| {get(training_row,'model_id'):36s} "
            f"| {get(training_row,'model_type'):9s} "
            f"| {get(training_row,'test_loss'):10s} "
            f"| {get(training_row,'train_loss'):10s} "
            f"| {get(evaluation_row,'test_mse'):10s} "
            f"| {get(evaluation_row,'train_mse'):10s} "
            f"| {get(evaluation_row,'test_mae'):10s} "
            f"| {get(evaluation_row,'train_mae'):10s} "
            f"| {get(training_row,'input_variables')}"
        )

    def dump(self):
        self._print_row(
            {
                "model_id": "ModelID",
                "model_type": "ModelType",
                "test_loss": "Test Loss",
                "train_loss": "Train Loss",
                "input_variables": "Inputs",
            },
            {
                "test_mse": "Test MSE",
                "train_mse": "Train MSE",
                "test_mae": "Test MAE",
                "train_mae": "Train MAE",
            },
        )
        for row in self.list_models():
            formatted = self._fmt_training(row)
            eval_rows = self.list_evaluations(row["model_id"])
            if not eval_rows:
                self._print_row(formatted, None)
            else:
                for i, erow in enumerate(eval_rows):
                    self._print_row(
                        formatted if i == 0 else {}, self._fmt_evaluation(erow)
                    )
        print()

    def _dump_item(self, item, field_names):
        maxlen = max(
            (len(field_names.get(k, k)) for k in item), default=0
        )
        for key, value in item.items():
            display_key = field_names.get(key, key)
            padded = " " * (maxlen - len(display_key)) + display_key
            if isinstance(value, str) and value.startswith("{"):
                lines = json.dumps(json.loads(value), indent=4).split("\n")
            else:
                lines = str(value).split("\n")
            print(padded + ": " + lines[0])
            for line in lines[1:]:
                print(maxlen * " " + "  " + line)

    def dump_model(self, model_id):
        curs = self.conn.cursor()
        print("\n\nModel:")
        rows = self._rows(
            curs.execute(
                "SELECT * FROM MODEL_TRAINING WHERE model_id=?", [model_id]
            )
        )
        if not rows:
            print("Model not found")
            return
        for row in rows:
            self._dump_item(row, {"model_id": "Model ID"})
        print("\n\nModel Evaluations:")
        rows = self.list_evaluations(model_id)
        if rows:
            for row in rows:
                self._dump_item(row, {"model_id": "Model ID"})
        else:
            print("No evaluations found")
