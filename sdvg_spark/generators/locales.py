"""Locale packs: letters, names, phone patterns, word lists.

The engine's locale contract (mirroring the reference's LocalModule
interface, /root/reference .../locale/interfaces.go:4-21): per locale we
expose small/large letters, first/last names, phone patterns ('#' =
digit position), words for text generation, and bytes-per-char. Name and
word lists here are original compact lists of common public names/words
(NOT the reference's data files); the engine only requires that lists be
deterministic and sorted so the n-th-element draw is total-ordered.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

NUMBERS = "0123456789"
SPECIAL_CHARS = "!#$%&()*+,-.:;<=>?@_{|}"
WORDS_DELIMITER = " "

_EN_MALE_FIRST = """
Aaron Adam Adrian Alan Albert Alexander Alfred Andrew Anthony Arthur Austin
Barry Benjamin Bernard Blake Brandon Brian Bruce Bryan Caleb Calvin Carl
Charles Christian Christopher Clarence Clifford Cody Colin Connor Craig
Curtis Dale Daniel Darren David Dean Dennis Derek Dominic Donald Douglas
Duncan Dylan Earl Edgar Edmund Edward Elliot Eric Ernest Ethan Eugene Evan
Felix Francis Frank Frederick Gabriel Gareth Gary Gavin George Gerald
Gilbert Glenn Gordon Graham Grant Gregory Harold Harry Harvey Henry Herbert
Howard Hugh Ian Isaac Jack Jacob James Jason Jeffrey Jeremy Jerome Jesse
John Jonathan Jordan Joseph Joshua Julian Justin Keith Kenneth Kevin Kyle
Lance Laurence Lawrence Leonard Lewis Liam Lloyd Logan Louis Lucas Luke
Malcolm Marcus Mark Martin Matthew Maurice Maxwell Michael Miles Mitchell
Nathan Neil Nicholas Nigel Noah Norman Oliver Oscar Owen Patrick Paul Percy
Peter Philip Quentin Ralph Raymond Reginald Richard Robert Roger Ronald Ross
Roy Russell Ryan Samuel Scott Sean Sebastian Seth Sidney Simon Spencer
Stanley Stephen Stuart Terence Theodore Thomas Timothy Toby Travis Trevor
Tristan Tyler Victor Vincent Walter Warren Wayne Wesley William Zachary
""".split()

_EN_FEMALE_FIRST = """
Abigail Adelaide Agnes Alice Amanda Amber Amelia Amy Andrea Angela Anna Anne
Annette Ashley April Audrey Barbara Beatrice Bernadette Bethany Brenda
Bridget Brooke Camilla Carol Caroline Catherine Cecilia Charlotte Chloe
Christina Claire Clara Claudia Colleen Constance Courtney Crystal Cynthia
Daisy Danielle Daphne Deborah Denise Diana Donna Doris Dorothy Edith Eleanor
Elizabeth Ella Ellen Emily Emma Erica Esther Evelyn Felicity Fiona Florence
Frances Gabrielle Gemma Georgia Gillian Gladys Glenda Gloria Grace Gwendolyn
Hannah Harriet Hazel Heather Helen Hilary Holly Irene Iris Isabel Isabella
Jacqueline Jane Janet Janice Jasmine Jennifer Jessica Jillian Joan Joanna
Josephine Joyce Judith Julia Juliet June Karen Katherine Kathleen Kelly
Kimberly Kirsten Laura Lauren Leah Lillian Lily Linda Lisa Lorraine Louise
Lucy Lydia Mabel Madeline Margaret Maria Marian Marjorie Martha Mary Matilda
Maureen Megan Melanie Melissa Michelle Mildred Miranda Molly Monica Nancy
Naomi Natalie Nicola Nina Nora Olivia Pamela Patricia Paula Pauline Penelope
Phoebe Phyllis Rachel Rebecca Regina Rhonda Rosalind Rose Rosemary Ruth
Sabrina Sally Samantha Sandra Sarah Sharon Sheila Shirley Sophia Stella
Stephanie Susan Sylvia Tabitha Tanya Teresa Tessa Theresa Tracy Ursula
Valerie Vanessa Vera Veronica Victoria Violet Virginia Vivian Wendy Yvonne
""".split()

_EN_LAST = """
Adams Alexander Allen Anderson Andrews Armstrong Atkinson Bailey Baker
Baldwin Ball Banks Barber Barker Barnes Barrett Barton Bates Baxter Bell
Bennett Benson Berry Bishop Black Blake Bolton Booth Bowen Boyd Bradley
Brennan Briggs Brooks Brown Bryant Burgess Burke Burns Burton Butler Byrne
Cameron Campbell Carpenter Carr Carroll Carter Chambers Chapman Clark
Clarke Cole Coleman Collins Cook Cooper Cox Craig Crawford Cross Cunningham
Curtis Dale Daly Daniels Davidson Davies Davis Dawson Day Dean Dennis Dixon
Dodd Douglas Doyle Duncan Dunn Edwards Elliott Ellis Evans Farrell Ferguson
Field Fisher Fitzgerald Fleming Fletcher Ford Foster Fowler Fox Francis
Fraser Freeman French Frost Fuller Gallagher Gardner Garner George Gibbons
Gibson Gilbert Gill Glover Goodwin Gordon Gough Graham Grant Gray Green
Greenwood Gregory Griffin Griffiths Hale Hall Hamilton Hammond Hancock
Harding Hardy Hargreaves Harper Harris Harrison Hart Harvey Hawkins Hayes
Haynes Henderson Henry Hewitt Hicks Higgins Hill Hilton Hobbs Hodgson
Holland Holmes Holt Hooper Hopkins Horton Houghton Howard Howe Hudson
Hughes Humphries Hunt Hunter Hussain Hutchinson Jackson James Jarvis
Jenkins Jennings Johnson Johnston Jones Jordan Kaur Kay Kelly Kemp Kennedy
Kent Kerr King Kirby Kirk Knight Lane Lawrence Lawson Leach Lee Lewis
Little Lloyd Long Lord Lowe Lucas Lynch Lyons Mann Marsh Marshall Martin
Mason Matthews May McCarthy McDonald Mellor Mills Mitchell Moore Moran
Morgan Morley Morris Morrison Morton Moss Murphy Murray Myers Nash Naylor
Nelson Newman Newton Nicholls Nicholson Nixon Noble Nolan Norman Norris
North Norton Oliver Osborne Owen Page Palmer Parker Parkinson Parry
Parsons Patel Payne Pearce Pearson Perkins Perry Peters Phillips Pickering
Poole Pope Porter Potter Powell Power Pratt Preston Price Pritchard Quinn
Randall Read Reed Rees Reid Reynolds Rhodes Rice Richards Richardson Riley
Roberts Robertson Robinson Rogers Rose Ross Rowe Russell Ryan Sanders
Saunders Savage Scott Shaw Shepherd Sheppard Short Simmons Simpson Sims
Sinclair Singh Slater Smart Smith Spencer Stanley Steele Stephens Stevens
Stevenson Stewart Stokes Stone Sutton Swift Tanner Taylor Thomas Thompson
Thomson Thorne Thornton Todd Townsend Tucker Turnbull Turner Vaughan
Vincent Walker Wall Wallace Walsh Walton Ward Warner Warren Waters Watkins
Watson Watts Webb Webster Wells West Wheeler White Whitehead Whittaker
Wilkins Wilkinson Williams Williamson Willis Wilson Winter Wood Woods
Woodward Wright Wyatt Yates Young
""".split()

_EN_WORDS = """
a able about above act add after again against age ago air all almost alone
along also always among an and animal answer any appear are area arm around
art as ask at away baby back bad ball base be bear beauty bed been before
began begin behind best better between big bird black blue boat body book
both box boy bring brought build busy but by call came can car care carry
case cause center certain change check child children city class clear
close cold color come common complete could country course cover cross cry
cut dark day decide deep develop did differ do does dog done door down draw
dream drive dry during each early earth ease east eat edge end enough even
ever every example eye face fact fall family far farm fast father fear feel
feet fell few field figure fill final find fine fire first fish five fly
follow food foot for force form found four free friend from front full game
gave get girl give go gold good got great green ground group grow had half
hand happen hard has have he head hear heard heart heat held help her here
high hill him his hold home hope horse hot hour house how hundred idea if
in inch interest is it job jump just keep kept kind king knew know land
language large last late laugh lay lead learn leave left less let letter
life light like line list listen little live long look lost lot loud love
low machine made main make man many map mark may me mean measure men might
mile mind minute miss money moon more morning most mother mountain move
much music must my name near need never new next night no north note
nothing notice noun now number object of off often oh oil old on once one
only open or order other our out over own page paper part pass past
pattern people perhaps person picture piece place plain plan plant play
point poor possible power press pretty problem produce pull put question
quick quite rain ran reach read ready real record red remember rest right
river road rock room round rule run said same saw say school science sea
second see seem self sentence serve set seven several shape she ship short
should show side simple since sing six size sleep slow small snow so some
song soon sound south space special spell stand star start state stay step
still stood stop story street strong study such sun sure surface table
tail take talk teach tell ten test than that the their them then there
these they thing think this those though thought thousand three through
time to together told too took top toward town travel tree true try turn
two under understand unit until up upon us use usual very voice vowel wait
walk want warm was watch water wave way we week weight well went were west
what wheel when where which while white who whole why wide wild will wind
with wonder wood word work world would write year yes yet you young your
""".split()

_EN_PHONE_PATTERNS = [
    "##########",
    "### ### ####",
    "###-###-####",
    "###.###.####",
    "(###) ###-####",
]

_RU_MALE_FIRST = """
Абрам Аркадий Арсений Артемий Артур Богдан Борис Вадим Валентин Валерий
Василий Виктор Виталий Владимир Владислав Всеволод Вячеслав Геннадий Георгий
Герман Глеб Григорий Давид Даниил Денис Дмитрий Евгений Егор Иван Игорь
Илья Иннокентий Кирилл Константин Лев Леонид Макар Максим Марат Марк
Матвей Михаил Никита Николай Олег Павел Петр Прохор Роман Ростислав Руслан
Савелий Семен Сергей Станислав Степан Тимофей Тимур Федор Филипп Эдуард
Юрий Ярослав
""".split()

_RU_FEMALE_FIRST = """
Агата Алена Алина Алиса Алла Анастасия Ангелина Анжела Анна Антонина
Валентина Валерия Варвара Вера Вероника Виктория Галина Дарья Диана Ева
Евгения Екатерина Елена Елизавета Жанна Зинаида Зоя Инна Ирина Карина Кира
Клавдия Кристина Ксения Лариса Лидия Лилия Любовь Людмила Маргарита Марина
Мария Надежда Наталья Нина Оксана Олеся Ольга Полина Раиса Регина Светлана
София Таисия Тамара Татьяна Ульяна Юлия Яна
""".split()

_RU_LAST = """
Абрамов Александров Алексеев Андреев Антонов Афанасьев Баранов Белов
Белоусов Беляев Богданов Борисов Васильев Виноградов Владимиров Волков
Воробьев Гаврилов Герасимов Голубев Горбунов Гордеев Григорьев Гусев
Давыдов Данилов Дмитриев Егоров Ефимов Жуков Зайцев Захаров Иванов Ильин
Исаев Казаков Калинин Карпов Киселев Козлов Колесников Комаров Кондратьев
Королев Кошелев Крылов Кудрявцев Кузнецов Кузьмин Лазарев Лебедев Леонов
Логинов Лукин Макаров Максимов Мартынов Матвеев Медведев Мельников Миронов
Михайлов Морозов Назаров Некрасов Никитин Николаев Новиков Овчинников
Орлов Осипов Павлов Пантелеев Петров Поляков Пономарев Попов Прохоров
Романов Рябов Савельев Сафонов Семенов Сергеев Сидоров Смирнов Соболев
Соколов Соловьев Сорокин Степанов Тарасов Тимофеев Титов Тихонов Третьяков
Трофимов Федоров Федотов Филиппов Фомин Фролов Цветков Чернов Шестаков
Широков Щербаков Яковлев
""".split()

_RU_WORDS = """
а без белый берег больше большой быть век вид вода война вопрос время все
всегда высокий глаз год голова голос город группа давать далеко дать дважды
дело день дерево дом дорога друг думать душа его если есть еще жизнь жить
закон земля знать идти из или иметь имя иногда история каждый книга когда
конец лес лето лицо любить люди машина место месяц мир много может мочь
мысль найти народ начало наш небо нет новый нога ночь общий один окно он
она они оно опять отец очень первый песня писать план плохо поле помнить
пора после потом почти право проблема просто путь работа раз разный рано
река решение род рука сам свет свой себя сегодня сейчас семья сердце сила
сильный система сказать слово случай смотреть снова совет совсем солнце
спасибо стать сторона страна считать сын так там твой тело теперь тогда
тоже только труд утро форма хлеб хорошо хотеть час часто часть человек
через число читать шаг школа это язык
""".split()

_RU_PHONE_PATTERNS = [
    "8##########",
    "8 ### ### ####",
    "8(###)###-##-##",
]


@dataclass(frozen=True)
class LocalePack:
    locale: str
    small_letters: str
    large_letters: str
    male_first_names: tuple[str, ...]
    female_first_names: tuple[str, ...]
    last_names: tuple[str, ...]
    phone_patterns: tuple[str, ...]
    words: tuple[str, ...]
    bytes_per_char: int

    def first_names(self, min_len: int = 0, max_len: int = 10**9) -> list[str]:
        """All first names (male + female, sorted) within rune-length bounds."""
        allnames = sorted(set(self.male_first_names) | set(self.female_first_names))
        return [n for n in allnames if min_len <= len(n) <= max_len]

    def last_names_filtered(self, min_len: int = 0, max_len: int = 10**9) -> list[str]:
        return [n for n in sorted(set(self.last_names)) if min_len <= len(n) <= max_len]

    def phone_patterns_filtered(self, min_len: int = 0, max_len: int = 10**9) -> list[str]:
        pats = [p for p in self.phone_patterns if min_len <= len(p) <= max_len]
        return _sort_phone_patterns(pats)

    def one_letter_words(self) -> list[str]:
        return [w for w in self.words if len(w) == 1]


def _sort_phone_patterns(patterns: list[str]) -> list[str]:
    """Sort so that the pattern order is consistent with the numeric fill
    order (total order over generated phones — reference SortPhones)."""
    return sorted(patterns, key=lambda p: p.replace("#", "0"))


@lru_cache(maxsize=4)
def get_locale(locale: str) -> LocalePack:
    if locale == "en":
        return LocalePack(
            locale="en",
            small_letters="abcdefghijklmnopqrstuvwxyz",
            large_letters="ABCDEFGHIJKLMNOPQRSTUVWXYZ",
            male_first_names=tuple(sorted(_EN_MALE_FIRST)),
            female_first_names=tuple(sorted(_EN_FEMALE_FIRST)),
            last_names=tuple(sorted(_EN_LAST)),
            phone_patterns=tuple(_sort_phone_patterns(_EN_PHONE_PATTERNS)),
            words=tuple(sorted(set(_EN_WORDS))),
            bytes_per_char=1,
        )
    if locale == "ru":
        return LocalePack(
            locale="ru",
            small_letters="абвгдежзийклмнопрстуфхцчшщъыьэюя",
            large_letters="АБВГДЕЖЗИЙКЛМНОПРСТУФХЦЧШЩЪЫЬЭЮЯ",
            male_first_names=tuple(sorted(_RU_MALE_FIRST)),
            female_first_names=tuple(sorted(_RU_FEMALE_FIRST)),
            last_names=tuple(sorted(_RU_LAST)),
            phone_patterns=tuple(_sort_phone_patterns(_RU_PHONE_PATTERNS)),
            words=tuple(sorted(set(_RU_WORDS))),
            bytes_per_char=2,
        )
    raise ValueError(f"unknown locale: {locale}")


def charset_for(params) -> str:
    """Sorted charset for plain string generation, honoring without_* flags."""
    pack = get_locale(params.locale)
    chars = ""
    if not params.without_large_letters:
        chars += pack.large_letters
    if not params.without_small_letters:
        chars += pack.small_letters
    if not params.without_numbers:
        chars += NUMBERS
    if not params.without_special_chars:
        chars += SPECIAL_CHARS
    return "".join(sorted(chars))
