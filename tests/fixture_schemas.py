"""Shared fixture schemas (FIXTURES.md F1/F2)."""

PERSON_FLAT = {
    "name": "person",
    "type": "record",
    "fields": [
        {"name": "FirstName", "type": "string"},
        {"name": "LastName", "type": "string", "default": ""},
        {"name": "Age", "type": "int"},
        {"name": "Sex", "type": "int"},
        {"name": "PhoneNumber", "type": "string", "default": ""},
        {"name": "HomeAddress", "type": "string", "default": ""},
        {"name": "Occupation", "type": "string", "default": ""},
    ],
}

STAT_NAMES = [
    "Strength", "Perception", "Endurance", "Charisma", "Intelligence", "Agility", "Luck",
]

PERSON_BENCH = {
    "name": "Person",
    "namespace": "Person",
    "type": "record",
    "fields": [
        {"name": "FirstName", "type": "string"},
        {"name": "LastName", "type": "string"},
        {"name": "Class", "type": "string"},
        {"name": "Age", "type": "long"},
        {"name": "Sex", "type": {"type": "enum", "name": "Sex", "symbols": ["FEMALE", "MALE"]}},
        {
            "name": "Stats",
            "type": {
                "type": "record",
                "name": "Stats",
                "fields": [{"name": n, "type": "long"} for n in STAT_NAMES],
            },
        },
        {"name": "Journal", "type": {"type": "array", "items": "string"}},
    ],
}
