#!/usr/bin/env python
"""Build the character-trigram language-ID model data file (P17).

The reference calls a fastText LID model from its locations plane
(``CreateLocationsMapped.sql:26``); the open engine ships a
deterministic trigram profile model instead — same serving seam
(model artifact on disk, loaded once per worker), reproducible build.

Seed corpora are small hand-written paragraphs of ordinary prose per
language (function-word-rich, which is what character trigrams key on).
The model keeps the top-K trigrams per language with their integer
counts as weights. Rebuild: ``python scripts/build_lid_model.py``.
"""

from __future__ import annotations

import json
import os
from collections import Counter

TOP_K = 300
NGRAM_SIZES = (1, 2, 3)  # Cavnar-Trenkle style mixed-order profile:
# unigrams carry script identity (Han/kana/Cyrillic), trigrams carry
# function-word shape — short CJK inputs need the low orders.
#
# Weights are length-normalized (count / total ngram mass of the seed,
# scaled to parts-per-million) so a longer seed corpus doesn't make its
# language score higher on everything, then boosted 4x per ngram order
# so discriminative trigrams outvote script-level unigram noise between
# same-script languages.
ORDER_BOOST = {1: 1, 2: 4, 3: 16}
SCALE = 1_000_000

SEEDS: dict[str, str] = {
    "en": (
        "the results of the study show that the proposed method improves "
        "performance on all of the benchmark tasks and that it is robust "
        "to noise in the training data. we describe the experimental setup "
        "and then discuss the findings in detail. these observations are "
        "consistent with previous work on this topic and they suggest that "
        "further research is needed before the approach can be used more "
        "widely. in this paper we present a new framework for the analysis "
        "of large collections of documents and show that it scales well."
    ),
    "de": (
        "die ergebnisse der studie zeigen dass die vorgeschlagene methode "
        "die leistung bei allen aufgaben verbessert und dass sie robust "
        "gegen rauschen in den trainingsdaten ist. wir beschreiben den "
        "aufbau des experiments und diskutieren anschließend die befunde "
        "im detail. diese beobachtungen sind mit früheren arbeiten zu "
        "diesem thema vereinbar und sie legen nahe dass weitere forschung "
        "notwendig ist bevor der ansatz breiter eingesetzt werden kann. "
        "in dieser arbeit stellen wir einen neuen rahmen für die analyse "
        "großer dokumentsammlungen vor und zeigen dass er gut skaliert."
    ),
    "es": (
        "los resultados del estudio muestran que el método propuesto "
        "mejora el rendimiento en todas las tareas y que es robusto "
        "frente al ruido en los datos de entrenamiento. describimos la "
        "configuración experimental y luego discutimos los hallazgos en "
        "detalle. estas observaciones son consistentes con trabajos "
        "anteriores sobre este tema y sugieren que se necesita más "
        "investigación antes de que el enfoque pueda utilizarse de forma "
        "más amplia. en este artículo presentamos un nuevo marco para el "
        "análisis de grandes colecciones de documentos y mostramos que "
        "escala bien."
    ),
    "fr": (
        "les résultats de l'étude montrent que la méthode proposée "
        "améliore les performances sur toutes les tâches et qu'elle est "
        "robuste au bruit dans les données d'entraînement. nous décrivons "
        "le dispositif expérimental puis nous discutons les résultats en "
        "détail. ces observations sont cohérentes avec les travaux "
        "antérieurs sur ce sujet et elles suggèrent que des recherches "
        "supplémentaires sont nécessaires avant que l'approche puisse "
        "être utilisée plus largement. dans cet article nous présentons "
        "un nouveau cadre pour l'analyse de grandes collections de "
        "documents et montrons qu'il passe bien à l'échelle."
    ),
    "zh": (
        "研究结果表明所提出的方法在所有基准任务上都提高了性能并且对训练数据中的噪声具有鲁棒性"
        "我们描述了实验设置然后详细讨论了研究发现这些观察结果与该主题的先前工作一致"
        "它们表明在该方法得到更广泛应用之前还需要进一步的研究"
        "在本文中我们提出了一个用于分析大型文档集合的新框架并证明它具有良好的扩展性"
        "数据处理系统需要在大规模集群上高效运行查询优化器选择最佳的执行计划"
    ),
    "ru": (
        "результаты исследования показывают что предложенный метод "
        "улучшает производительность во всех задачах и что он устойчив "
        "к шуму в обучающих данных. мы описываем постановку эксперимента "
        "а затем подробно обсуждаем полученные результаты. эти наблюдения "
        "согласуются с предыдущими работами по данной теме и они "
        "показывают что необходимы дальнейшие исследования прежде чем "
        "подход можно будет применять более широко. в этой статье мы "
        "представляем новую систему для анализа больших коллекций "
        "документов и показываем что она хорошо масштабируется."
    ),
    "ja": (
        "研究の結果は提案された手法がすべてのベンチマークタスクで性能を向上させ"
        "訓練データのノイズに対して頑健であることを示しています"
        "実験の設定を説明しその後で結果を詳しく議論します"
        "これらの観察は このテーマに関する先行研究と一致しており"
        "手法がより広く使われる前にさらなる研究が必要であることを示唆しています"
        "本論文では大規模な文書コレクションの分析のための新しい枠組みを提案します"
    ),
}


def ngrams(text: str) -> list[str]:
    t = text.lower()
    return [
        t[i : i + n] for n in NGRAM_SIZES for i in range(len(t) - n + 1)
    ]


def main() -> None:
    model = {}
    for lang, seed in SEEDS.items():
        counts = Counter(ngrams(seed))
        total = sum(counts.values())
        weighted = {
            g: max(1, round(c * SCALE / total)) * ORDER_BOOST[len(g)]
            for g, c in counts.items()
        }
        top = dict(
            sorted(weighted.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
        )
        model[lang] = top
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "openalex_walden_spark",
        "functions",
        "lid_model.json",
    )
    with open(out, "w", encoding="utf-8") as f:
        json.dump({"version": 1, "top_k": TOP_K, "langs": model}, f, ensure_ascii=False, sort_keys=True)
    print(f"wrote {out}: {len(model)} langs, top_k={TOP_K}")


if __name__ == "__main__":
    main()
