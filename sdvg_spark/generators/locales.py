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

_EN_MALE_FIRST += """
Abel Abraham Ahmed Aidan Alec Alejandro Alfie Alfonso Ali Allan Alonzo Alvin
Amos Anders Andre Andres Angelo Angus Ansel Antonio Archer Archie Arlo
Armando Arnold Asher Ashton Atticus August Augustine Avery Axel Barnaby
Barrett Bart Bartholomew Basil Beau Beckett Ben Benedict Bennett Benny
Bernardo Bert Bertram Bill Billy Bob Bobby Boris Boyd Brad Bradley Brady
Brandt Brendan Brennan Brent Brett Brock Broderick Brody Brooks Bryce Buck
Burton Byron Cade Caden Cameron Carlos Carlton Carson Carter Cary Casey
Cassius Cecil Cedric Cesar Chad Chandler Charlie Chase Chester Chris Clark
Claude Clay Clayton Clement Cliff Clifton Clint Clinton Clyde Cole Coleman
Conrad Corey Cornelius Cory Crispin Cruz Cyrus Dallas Dalton Damian Damon
Dane Danny Dante Darius Darnell Darrell Darryl Dave Davis Dawson Dexter
Diego Dillon Dion Dirk Dmitri Dominick Don Donovan Dorian Doyle Drake Drew
Duane Dudley Dwayne Dwight Earnest Eddie Eddy Edwin Eli Elias Elijah Elliott
Ellis Elmer Elton Emanuel Emerson Emil Emmanuel Emmett Enrique Erik Ernesto
Errol Ervin Esteban Everett Ezekiel Ezra Fabian Fernando Fletcher Floyd
Forrest Foster Franklin Fred Freddie Gale Garrett Garry Gene Geoffrey
Gideon Giles Gino Godfrey Gonzalo Grady Grayson Gregor Griffin Gus Guy
Hal Hamish Hank Hans Harlan Harley Harrison Hayden Heath Hector Herman
Hiram Homer Horace Hubert Hudson Hugo Humphrey Hunter Ignatius Igor Ira
Irving Isaiah Ishmael Ivan Jake Jamal Jared Jarrett Jasper Javier Jay Jeff
Jefferson Jeremiah Jermaine Jerry Jesus Jim Jimmy Joaquin Joe Joel Joey
Johnny Jon Jonah Jonas Jorge Jose Josiah Juan Judd Jude Jules Julio Junior
Karl Keegan Kelvin Ken Kendall Kendrick Kent Kermit Kieran Kirk Klaus Kody
Kris Kurt Lambert Lamont Landon Lars Lee Leland Lemuel Leo Leon Leopold
Leroy Leslie Lester Levi Lincoln Lionel Lonnie Loren Lorenzo Lou Lowell
Lucian Luis Luther Lyle Lyndon Mack Magnus Manuel Marco Marcel Mario Marion
Marlon Marshall Marty Marvin Mason Mateo Matthias Maurice Max Maximilian
Maynard Melvin Merle Merlin Micah Mickey Miguel Milo Milton Mitch Monty
Mordecai Morgan Morris Mortimer Morton Moses Murray Myron Nash Nathaniel
Ned Nelson Nestor Neville Newton Nick Nolan Norbert Norris Obadiah Octavio
Odell Olaf Olin Ollie Omar Orion Orlando Orson Orville Osborn Oswald Otis
Otto Pablo Parker Pascal Pat Pedro Percival Perry Pete Phineas Pierce
Pierre Porter Preston Prince Quincy Quinn Rafael Ramon Randall Randolph
Randy Raphael Raul Ray Reed Reese Reggie Regis Remington Rene Reuben Rex
Reynold Rhett Ricardo Rick Rickey Ricky Rob Robin Rocco Rod Roderick Rodney
Rodrigo Roland Rolando Roman Romeo Ronan Ronnie Roosevelt Rory Roscoe Ross
Rowan Ruben Rudolph Rudy Rufus Rupert Russ Rusty Salvador Sam Sammy Santiago
Saul Sawyer Shane Shannon Shaun Shawn Sheldon Sherman Sid Silas Simeon
Solomon Sonny Stan Stanford Sterling Steve Steven Stewart Sullivan Sylvester
Tanner Ted Teddy Terrance Terrell Terry Thaddeus Theo Theron Tim Tobias Todd
Tom Tommy Tony Trent Trenton Trey Troy Tucker Turner Ulysses Uriah Van Vance
Vaughn Vern Vernon Vicente Vince Virgil Vladimir Wade Waldo Wallace Walt
Ward Wendell Wilbur Wilfred Will Willard Willie Wilson Winston Wolfgang
Woodrow Wyatt Xavier Zane Zeke
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

_EN_FEMALE_FIRST += """
Ada Adele Adeline Adriana Adrienne Aileen Aimee Alana Alexa Alexandra
Alexis Alicia Alison Allison Alma Alyssa Amalia Amara Amara Amelie Anastasia
Angelica Angelina Anita Annabel Annabelle Annemarie Annie Antoinette Antonia
Ariana Arielle Arlene Ashlyn Astrid Athena Aurora Autumn Ava Avery Beatrix
Becky Belinda Bella Bernice Bertha Bessie Beth Bethel Betsy Bette Betty
Beverly Bianca Billie Blair Blanche Bonnie Brandy Breanna Bree Briana
Brianna Brittany Brooklyn Callie Camille Candace Candice Cara Carla Carlotta
Carmen Carmela Carole Carolyn Carrie Cassandra Cassidy Cecile Celeste Celia
Celine Charity Charlene Chelsea Cherie Cheryl Christine Cindy Clarissa
Claudette Clementine Cleo Colette Connie Cora Coral Corinne Cornelia
Dana Darla Darlene Dawn Deanna Debbie Debra Delia Delilah Della Delphine
Desiree Dina Dixie Dolores Dominique Dora Doreen Dorothea Dottie Eden Edna
Eileen Elaine Eleanora Elena Elisa Elisabeth Elise Eliza Elsa Elsie Elvira
Emilia Emmeline Enid Erin Ernestine Estelle Esther Ethel Etta Eugenia
Eunice Eva Evangeline Eve Evie Faith Fanny Fay Faye Fern Flora Fran
Francesca Francine Freda Frieda Gail Gayle Genevieve Georgette Georgina
Geraldine Gerda Gilda Gina Ginger Giselle Greta Gretchen Guadalupe Gwen
Hailey Haley Hallie Harmony Hattie Heidi Helena Helene Henrietta Hermione
Hester Hilda Hope Ida Ima Imogen Ines Ingrid Irma Isadora Ivy Jackie Jada
Jamie Janelle Janie Janine Jayne Jean Jeanette Jeanne Jeannie Jenna Jenny
Jewel Jill Jo Joanne Jocelyn Jodi Jody Johanna Jolene Joni Jordan Josie
Joy Juanita Judy June Juniper Justine Kara Kate Katie Katrina Kay Kaye
Kayla Keira Kendra Kerry Kitty Kristen Kristin Kristina Kristine Krystal
Lacey Lana Lara Larissa Laurel Laverne Leanne Leila Lena Leona Leonora
Leslie Leticia Lettie Libby Lila Lilith Lillie Lina Lindsay Lindsey Lois
Lola Lonnie Lora Lorena Loretta Lori Lorna Lottie Lucia Lucille Lucinda
Luella Lulu Luna Lynda Lynette Lynn Mabelle Mackenzie Madeleine Madge Mae
Magda Magdalena Maggie Maisie Mallory Mamie Mandy Mara Marcella Marcia
Margarita Margery Margot Marguerite Marianne Maribel Marie Marietta Marilyn
Marina Marisa Marisol Marlene Marsha Maryann Mavis Maxine Maya May Meg
Mercedes Meredith Merle Mia Millicent Millie Mimi Mindy Minerva Minnie
Miriam Misty Mona Monique Morgan Muriel Myra Myrtle Nadia Nadine Nanette
Natasha Nell Nellie Nettie Nichole Nikki Nola Noelle Noreen Norma Odessa
Olga Opal Ophelia Paige Pansy Patience Patsy Patty Pearl Peggy Petra
Phillipa Piper Polly Portia Priscilla Prudence Queenie Quinn Ramona Reba
Renee Rhea Rita Roberta Robin Robyn Rochelle Rosa Rosalie Rosanna Roselyn
Rosie Rowena Roxanne Ruby Sadie Sage Salome Sandy Saskia Savannah Selena
Selma Serena Shana Shanna Shari Shauna Shelby Shelley Sherry Shona Sierra
Simone Sonia Sonya Sophie Stacey Stacy Stefanie Sue Summer Susanna Susanne
Susie Suzanne Sybil Tallulah Tamara Tammy Tara Tasha Tatiana Thea Thelma
Tiffany Tilda Tina Toni Tonya Tricia Trina Trudy Uma Una Ursuline Velma
Vicki Vickie Vicky Viola Violetta Vivienne Wanda Whitney Wilhelmina Willa
Willow Wilma Winifred Yolanda Yvette Zelda Zoe
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

_EN_LAST += """
Abbott Acosta Aguilar Aguirre Albert Alvarado Alvarez Andrade Anthony
Archer Arias Arnold Ashley Atkins Austin Avery Avila Ayala Ayers Bakerson
Ballard Banner Barajas Barber Barlow Barnett Barr Barrera Barry Bartlett
Barton Bass Bauer Bauman Beard Beasley Beck Becker Beltran Bender Benitez
Bennet Bentley Berg Berger Bernard Berr Best Bird Blackburn Blackwell
Blanchard Blankenship Blevins Bond Bonilla Bonner Bowers Bowman Boyer
Boyle Bradford Bradshaw Brady Branch Brandt Braun Bravo Bray Brewer
Bridges Bright Brock Browning Bruce Bryan Buchanan Buck Buckley Bullock
Burch Burgos Burnett Burris Bush Bustos Butts Cabrera Cain Calderon
Caldwell Calhoun Callahan Camacho Campos Cannon Cantrell Cantu Cardenas
Carey Carlson Carney Carrillo Carson Carver Case Casey Castaneda Castillo
Castro Cervantes Chan Chandler Chaney Chang Charles Chase Chavez Chen
Cherry Choi Christensen Christian Chung Church Cisneros Clay Clayton
Clements Cline Cobb Cochran Coffey Cohen Colon Combs Compton Conley
Conner Conrad Contreras Conway Cooke Cooley Copeland Cordova Corona
Correa Cortez Costa Cote Cotton Cowan Crane Crespo Crosby Cruz Cuevas
Cummings Curry Dalton Daniel Daugherty Davenport David Davila Dawson
Decker Delacruz Delaney Deleon Delgado Dennis Diaz Dickerson Dickson
Dillard Dillon Dominguez Donaldson Donovan Dorsey Dougherty Downs Drake
Dudley Duffy Duke Duran Durham Dyer Eaton Ebert Echols Edmonds Elder
Elliot Ellison English Enriquez Erickson Escobar Esparza Espinoza Estes
Estrada Everett Ewing Farley Farmer Farrell Faulkner Felix Fernandez
Fields Figueroa Finch Finley Fischer Fitzpatrick Flores Florez Flynn
Foley Forbes Franco Frank Franklin Frazier Frederick Frey Frias Friedman
Frost Frye Fuentes Fuller Galindo Gallegos Galloway Galvan Gamble Garcia
Garrett Garrison Garza Gates Gentry Gibbs Gilliam Gilmore Glass Glenn
Golden Gomez Gonzales Gonzalez Goodman Grace Graves Greer Gregory Griffith
Grimes Gross Guerra Guerrero Guevara Gutierrez Guzman Hahn Haley Haney
Hanna Hansen Hanson Harmon Harrell Harrington Hartman Hatfield Hayden
Haynes Heath Hebert Henderson Hendricks Hendrix Henry Hensley Henson
Herman Hernandez Herrera Herring Hess Hester Hickman Hicks Hines Hinton
Ho Hodge Hoffman Hogan Holden Holder Holloway Hoover Horn Horne Horton
House Houston Hobbs Howell Hoyt Huang Hubbard Huber Huerta Huff Huffman
Hull Hurley Hurst Hutchins Ibarra Ingram Irwin Jacobs Jacobson Jaramillo
Jefferson Jensen Jimenez Johns Joseph Joyce Juarez Kane Kaufman Keith
Keller Kelley Kemp Kennedy Kent Kerr Key Khan Kidd Kim King Kirby Kirk
Klein Kline Knapp Knott Knox Koch Kramer Krause Krueger Kumar Lam Lambert
Landry Lang Langley Lara Larsen Larson Le Leach Leblanc Ledesma Leon
Leonard Lester Levine Levy Li Lim Lin Lindsay Lindsey Liu Livingston
Lopez Lozano Lucero Luna Lutz Lyons Ma Macdonald Macias Mack Madden
Maddox Mahoney Maldonado Malone Manning Marin Marks Marquez Martel
Martinez Mason Massey Mata Mathews Mathis Matthews Maxwell May Mayer
Maynard Mayo Mays Mcbride Mccall Mccann Mccarthy Mcclain Mcclure Mcconnell
Mccormick Mccoy Mccullough Mcdaniel Mcdonald Mcdowell Mcfarland Mcgee
Mcguire Mcintosh Mcintyre Mckay Mckee Mckenzie Mckinney Mcknight Mclaughlin
Mclean Mcmahon Mcmillan Mcneil Mcpherson Meadows Medina Mejia Melendez
Melton Mendez Mendoza Mercado Mercer Merritt Meyer Meyers Michael Middleton
Miles Miranda Mohamed Molina Monroe Montes Montgomery Montoya Moody Mora
Morales Moran Moreno Morin Morrison Morrow Morse Morton Mosley Moss Mueller
Mullen Mullins Munoz Murillo Murphy Murray Myers Nash Navarro Neal Nelson
Newman Newton Nguyen Nichols Nicholson Nielsen Nixon Noble Nolan Norman
Norris Norton Novak Nunez Ochoa Oconnor Odom Odonnell Oliver Olsen Olson
Oneal Oneill Orozco Orr Ortega Ortiz Osborn Osborne Owen Owens Pace
Pacheco Padilla Page Palacios Palmer Park Parks Parrish Parsons Patel
Patrick Patterson Patton Paul Payne Pearce Pearson Peck Pena Pennington
Peralta Perez Perkins Perry Person Peters Petersen Peterson Petty Pham
Phan Phelps Phillips Pierce Pineda Pittman Pitts Pollard Ponce Poole Pope
Porter Portillo Potts Powell Powers Pratt Price Prince Pruitt Pugh Quinn
Quintana Quintero Ramirez Ramos Ramsey Randall Randolph Rangel Rasmussen
Ray Raymond Reese Reeves Reid Reilly Reyes Reyna Reynolds Rhodes Rice
Rich Richard Richards Richardson Richmond Riddle Riggs Rios Ritter Rivas
Rivera Rivers Roach Robbins Roberson Roberts Robertson Robinson Robles
Rocha Rodgers Rodriguez Rogers Rojas Rollins Romano Romero Rosales Rosario
Rose Rosas Ross Roth Rowe Rowland Roy Rubio Ruiz Rush Russo Ryan Salas
Salazar Salinas Sampson Sanchez Sanders Sandoval Sanford Santana Santiago
Santos Saunders Savage Sawyer Schaefer Schmidt Schmitt Schneider Schroeder
Schultz Schwartz Scott Sellers Serrano Sexton Shaffer Shah Shannon Sharp
Shaw Shea Shelton Shepard Shepherd Sheppard Sherman Shields Short Sierra
Silva Simmons Simon Simpson Sims Singh Singleton Skinner Sloan Small Smith
Snow Snyder Solis Solomon Sosa Soto Sparks Spears Spence Spencer Stafford
Stanley Stanton Stark Steele Stein Stephens Stephenson Stevens Stevenson
Stewart Stokes Stone Stout Strickland Strong Stuart Suarez Sullivan
Summers Sutton Swanson Sweeney Tan Tanner Tapia Tate Taylor Terrell Terry
Thomas Thompson Thornton Tillman Todd Torres Townsend Tran Travis Trejo
Trevino Trujillo Tucker Turner Tyler Underwood Valdez Valencia Valentine
Valenzuela Vance Vang Vargas Vasquez Vaughan Vaughn Vazquez Vega Velasquez
Velazquez Velez Ventura Villa Villanueva Villarreal Vincent Vu Wagner
Walker Wall Wallace Waller Walls Walsh Walter Walters Walton Wang Ware
Warner Warren Washington Waters Watkins Watson Watts Weaver Webb Weber
Webster Weeks Weiss Welch Wells West Wheeler Whitaker White Whitehead
Whitney Wiggins Wilcox Wiley Wilkerson Wilkins Wilkinson Williams
Williamson Willis Wilson Winters Wise Witt Wolf Wolfe Wong Woodard Woods
Woodward Wright Wu Wyatt Xiong Yang Yates Yoder York Young Zamora Zavala
Zhang Zimmerman Zuniga
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

_EN_WORDS += """
ability absent accept access accident account accurate achieve acid acquire
across action active actor actual adapt adjust admire admit adopt adult
advance advantage adventure advice affect afford afraid afternoon agency
agent agree ahead aim alarm album alert alike alive allow ally aloud
already although amaze amount amuse analyze ancient anger angle angry
announce annual another anxious anybody anymore anyone anything anyway
anywhere apart apartment apology apparent appeal appetite apple apply
appoint approach approve argue arise arrange arrest arrive arrow article
artist asleep aspect assist assume attach attack attempt attend attention
attitude attract audience author autumn available average avoid awake
award aware awful awkward background backward bacon badge badly bake
balance balloon banana band bank bare bargain barrel barrier basic basket
battle beach bean beard beat because become bedroom beef beer beside
besides bet beyond bicycle bill bind biscuit bite bitter blade blame
blank blanket bleed blend bless blind block blood blow board boast boil
bold bomb bone bonus border borrow boss bother bottle bottom bounce bound
bowl brain brake branch brand brave bread break breakfast breath breathe
breeze brick bridge brief brilliant broad broken brother brush bubble
bucket budget bullet bunch burden burn burst bury bush business butter
button buyer cabin cabinet cable cake calm camera camp campaign canal
cancel candle candy cap capable capital captain capture carbon card
career careful careless cargo carpet carrot cart cartoon carve castle
casual cat catch cattle ceiling celebrate cell cellar cement cent century
ceremony chain chair chalk challenge chamber chance channel chapter charge
charity charm chart chase cheap cheat cheek cheer cheese chemical chest
chicken chief chimney chin choice choose chop circle citizen civil claim
clap clay clean clerk clever click client cliff climate climb clock cloth
clothes cloud clown club clue coach coal coast coat code coffee coin
collar collect college colony column comb combine comfort comma command
comment commerce commit committee compare compete complain complex
computer concern concert conclude concrete condition conduct confess
confirm conflict confuse congress connect conscious consent consider
consist constant contact contain content contest context continue
contract control convert convince cook cool copper copy cord core corn
corner correct cost cottage cotton cough council count counter county
couple courage court cousin crack craft crash crawl crazy cream create
creature credit creep crew crime crisp critic crop crowd crown cruel
crush culture cup cupboard cure curious curl current curtain curve
cushion custom customer cycle daily damage damp dance danger dare date
daughter dead deaf deal dear death debate debt decade deceive decent
declare decorate decrease deed defeat defend define degree delay
deliberate delicate deliver demand deny depart depend deposit depth
describe desert deserve design desire desk despair destroy detail
detect device devote diagram diamond diary dictionary die diet dig
dinner direct dirt dirty disagree disappear disaster discipline discover
discuss disease dish dismiss display distance distant distribute district
disturb ditch dive divide division doctor document dollar domestic
donate dot double doubt dozen draft drag drain drama drawer dress drink
drop drown drug drum duck due dull dust duty eager eagle ear earn
earnest earthquake easily eastern economy effect effort egg eight
either elbow elder electric element elephant eleven else emerge
emergency emotion emphasis empire employ empty enable encourage
enemy energy engage engine enjoy enormous ensure enter entire entrance
envelope environment envy equal equip error escape essay essential
establish estate estimate evening event evidence evil exact examine
excellent except exchange excite excuse exercise exist exit expand
expect expense experience expert explain explode explore export expose
express extend extent extra extreme fabric factory fail failure faint
fair faith false fame familiar famous fan fancy fashion fasten fat fault
favor feather feature fee feed female fence festival fetch fever fiction
fierce fifteen fifty fight film filter finance finger finish firm fit
fix flag flame flash flat flavor flesh flight float flood floor flour
flow flower fluid fold folk fond fool forbid forecast foreign forest
forget forgive fork formal former fortune forty forward frame freeze
frequent fresh fridge fruit fry fuel fun function fund funeral funny
fur furniture further future gain gallon gap garage garden gas gate
gather gear general generous gentle genuine gift glad glance glory
glove glue goal goat god golden golf goods govern grab grade gradual
grain grand grass grateful grave gray grease greet grey grief grind
grip gross guarantee guard guess guest guide guilty gun habit hair
hall hammer handle hang happy harbor harm harvest hat hate hay hazard
health heavy hell hello helpful hen hesitate hidden hide highway hire
hit hobby hole holiday hollow holy honest honey honor hook horizon
horror hospital host hotel huge human humble humor hungry hunt hurry
hurt husband ice ideal identify idle ignore ill illegal image imagine
immediate immense import impose impress improve incident include income
increase indeed independent index indicate individual indoor industry
infect inform initial injure inner innocent inquire insect insert
inside insist inspect install instant instead instrument insult
insurance intend intense interior internal international interrupt
interval interview introduce invent invest invite involve iron island
issue item jacket jam jar jaw jealous jelly jewel join joint joke
journey judge juice justice keen kettle kick kill kingdom kiss kitchen
kite knee knife knock knot label labor lack ladder lady lake lamp
laser laughter launch law lawyer layer lazy leaf league lean leather
lecture legal lemon lend length lesson level liberty library license
lid lift limb limit link lip liquid literature litter load loan local
lock lodge logic lonely loose lord lose loss lower loyal luck lump
lunch lung luxury mad mail major male manage manner march margin
marine market marry mass master match material matter mature maximum
maybe meal meat medical medicine medium meet melt member memory mend
mental mention menu mercy mere merry mess message metal method middle
mild military milk mill million mineral minimum minister minor mirror
mistake mix mixture model moderate modern modest moment monitor monkey
month moral motion motor mount mouse mouth multiply murder muscle
museum mushroom mystery nail narrow nation native nature navy nearly
neat necessary neck needle neighbor neither nephew nerve nest net
network nice niece noble nobody nod noise none nonsense noon normal
nose notebook nowhere nuclear nuisance nurse nut oath obey object
observe obtain obvious occasion occupy occur ocean odd offend offer
office officer official oppose opinion opportunity opposite option
orange ordinary organ origin ornament otherwise ought ounce outcome
outdoor outer outline output outside oven overcome overseas owe owner
oxygen pack package pad pain paint pair palace pale palm pan panel
panic parcel pardon parent park parliament partner party passage
passenger passion patient pause payment peace peak pen pencil penny
pension pepper perfect perform permanent permit personal persuade pet
phase phrase physical piano pick pig pigeon pile pilot pin pink pint
pipe pitch pity pizza plane planet plastic plate platform pleasant
please pleasure plenty plot plug plus pocket poem poet poetry poison
pole police policy polish polite political pool popular population
port portion position positive possess post postpone pot potato pound
pour powder practical practice praise pray prayer precious precise
prefer pregnant prepare presence present preserve president pressure
pretend prevent previous pride priest primary prime print prison
private prize probable proceed process profit program progress
project promise promote prompt pronounce proof proper property
proposal propose prospect protect protest proud prove provide public
publish punish pupil purchase pure purple purpose push puzzle quality
quantity quarrel quarter queen quiet rabbit race radio rail railway
raise range rank rapid rare rat rate rather raw razor react reaction
reason receipt receive recent recognize recommend reduce refer reflect
reform refresh refuse regard region register regret regular reject
relate relation relative relax release relevant relief religion rely
remain remark remedy remind remove rent repair repeat replace reply
report represent republic request require rescue research reserve
resign resist resource respect respond response responsible restaurant
result retain retire return reveal revenge review revise reward rice
rich rid ride ridge rifle ring ripe rise risk rival roast rob rope
rot rough routine row royal rub rubber rude ruin rumor rush rust
sack sad saddle safe safety sail sake salad salary sale salt sample
sand satisfy sauce save scale scare scatter scene scheme scholar
scissors score scrape scratch scream screen screw script search
season seat secret section secure seed seek seize seldom select
sell senate send senior sense sensible sensitive separate series
serious servant service session settle severe sew shade shadow
shake shallow shame share sharp shave shed sheep sheet shelf shell
shelter shift shine shirt shock shoe shoot shop shore shoulder shout
shower shut shy sick sight sign signal silence silent silk silly
silver similar sincere single sink sister sit site situation sixty
skill skin skirt sky slave slice slide slight slip slope smart smell
smile smoke smooth snake soap social society sock soft soil soldier
solid solution solve somebody somehow someone something sometimes
somewhere son sore sorrow sorry sort soul soup sour source spare
speak speed spend spill spin spirit spite splendid split spoil spoon
sport spot spray spread spring square squeeze stable staff stage
stain stairs stamp standard stare station statue status steady steal
steam steel steep steer stem stick stiff stir stock stomach store
storm stove straight strange stranger straw stream strength stress
stretch strict strike string strip stripe stroke structure struggle
stubborn student stuff stupid style subject substance succeed success
sudden suffer sugar suggest suit summer supply support suppose supreme
surely surgeon surprise surround survey survive suspect swallow swear
sweat sweep sweet swell swim swing switch sword symbol sympathy
system tablet tackle tale talent tall tank tap task taste tax tea
team tear telephone television temper temperature temple tempt tend
tender tennis tense tent term terrible territory terror text theater
theme theory thick thief thin third thirst thirty thread threat
threaten throat throw thumb thunder thus ticket tide tidy tie tight
till timber tin tiny tip tire tired title toe tomato tomorrow tone
tongue tonight tool tooth topic total touch tough tour trace track
trade tradition traffic train transfer translate transport trap
treasure treat treatment tremble trend trial tribe trick trip
triumph troop trouble truck trust truth tube tune tunnel turkey
twelve twenty twice twin twist type typical ugly umbrella unable
uncle underneath unfair uniform union unique unite universe unless
unusual upper upset upstairs urban urge urgent useful usually valley
valuable value van variety various vast vegetable vehicle venture
verse version vessel victim victory video view village violence
violent virtue visible vision visit vital vivid volume vote wage
waist wake wander war wardrobe warn wash waste weak wealth weapon
wear weather weave web wedding weed weekend welcome welfare wet
whatever wheat whenever whisper whistle wicked widow width wife
willing win wine wing winter wire wisdom wise wish witness woman
wonderful wool worker worry worse worst worth wound wrap wreck
wrist wrong yard yawn yearly yellow yesterday yield youth zero zone
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

_RU_MALE_FIRST += """
Август Аверкий Аврам Агап Агафон Адам Адриан Азарий Аким Александр Алексей
Альберт Анатолий Андрей Андриан Аникита Анисим Антип Антон Аполлон Арефий
Аристарх Арон Арсен Артем Архип Афанасий Бажен Болеслав Борислав Бронислав
Будимир Валерьян Варлам Варфоломей Венедикт Вениамин Викентий Вилен Виссарион
Влад Владилен Власт Влас Вольдемар Гавриил Гаврила Галактион Гарри
Гедеон Гелий Генрих Гервасий Гермоген Гоша Гранит Гурий Густав Давыд Дамир
Дан Данил Данила Дементий Демид Демьян Добрыня Донат Дорофей Евдоким
Евграф Евдоким Евлампий Евсей Евстафий Евстигней Елизар Елисей Емельян
Епифан Еремей Ермолай Ерофей Ефим Ефрем Захар Зиновий Зот Иакинф Игнат
Игнатий Измаил Изот Иларион Илларион Иннокент Иосиф Ипат Ипатий Ипполит
Ираклий Исаак Исай Исидор Июлий Казимир Каллистрат Капитон Карп Касьян
Ким Клавдий Клемент Климент Кондрат Кондратий Корнелий Корней Кузьма
Куприян Лаврентий Ладимир Лазарь Ларион Леонтий Лука Лукьян Любим Люсьен
Мавр Май Макарий Мануил Мартын Мефодий Мечислав Милан Милен Мирон Мирослав
Митрофан Михей Модест Моисей Мстислав Назар Назарий Натан Наум Нестор
Никандр Никанор Никифор Никодим Никон Нил Онисим Орест Осип Остап Панкрат
Панкратий Пантелей Парамон Пахом Пимен Платон Поликарп Порфирий Потап
Пров Прокл Прокофий Протас Равиль Радий Радислав Радомир Ратибор Ратмир
Рафаил Рем Ренат Родион Ролан Рубен Рудольф Рюрик Савва Самсон Самуил
Светозар Святогор Святополк Святослав Севастьян Северин Серафим Сигизмунд
Сильвестр Созон Сократ Соломон Софрон Спартак Спиридон Тарас Творимир
Терентий Тит Тихон Трифон Трофим Ульян Устин Фадей Фаддей Фёдор Федосей
Федот Феликс Феоктист Феофан Ферапонт Филат Филимон Фирс Фока Фома Фрол
Харитон Харлампий Христофор Эдгар Эдмунд Эльдар Эмиль Эммануил Эраст
Эрик Эрнест Ювеналий Юлиан Юлий Юстин Яким Яков Ян Януарий Ярополк
""".split()

_RU_FEMALE_FIRST = """
Агата Алена Алина Алиса Алла Анастасия Ангелина Анжела Анна Антонина
Валентина Валерия Варвара Вера Вероника Виктория Галина Дарья Диана Ева
Евгения Екатерина Елена Елизавета Жанна Зинаида Зоя Инна Ирина Карина Кира
Клавдия Кристина Ксения Лариса Лидия Лилия Любовь Людмила Маргарита Марина
Мария Надежда Наталья Нина Оксана Олеся Ольга Полина Раиса Регина Светлана
София Таисия Тамара Татьяна Ульяна Юлия Яна
""".split()

_RU_FEMALE_FIRST += """
Авдотья Аврора Агафья Аглая Агнесса Агния Ада Аделаида Аделина Адель
Азалия Аида Аксинья Акулина Александра Алевтина Альбина Амалия Анфиса
Анжелика Анисья Антонида Аполлинария Ариадна Арина Ася Аэлита Беатриса
Белла Берта Богдана Божена Борислава Бронислава Варя Васса Велимира
Венера Вера Вероника Веселина Веста Вилена Виолетта Вита Виталина
Влада Владилена Владислава Власта Гала Галя Ганна Гелена Гелия Генриетта
Гертруда Глафира Гликерия Горислава Грета Дана Дарина Дарья Дина Диана
Домна Дора Ева Евдокия Евлампия Евпраксия Европа Ефимия Ефросинья Жозефина
Забава Заря Зарина Земфира Злата Изабелла Изольда Илария Илона Инга
Инесса Иоанна Иоланта Ираида Искра Ия Калерия Камилла Капитолина Кармен
Каролина Катарина Клара Клементина Клеопатра Конкордия Констанция
Лада Лана Лейла Леокадия Леонида Леонилла Леся Ливия Лилиана Лина
Лия Лора Лукерья Лусине Люба Любава Люция Ляля Мавра Магда Магдалина
Майя Мальвина Маня Марианна Мариетта Марта Марфа Марьяна Матрена
Мелания Милада Милана Милена Милица Мира Мирослава Млада Мстислава
Муза Нана Настасья Ната Наталия Нелли Ника Нинель Нонна Олимпиада
Павла Павлина Пелагея Платонида Прасковья Рада Радмила Розалия Роза
Роксана Ростислава Руфина Сабина Саломея Сарра Серафима Сильвия
Синклитикия Слава Снежана Соломония Станислава Стелла Степанида
Сусанна Сюзанна Таира Текуса Теона Фаина Феврония Федора Фекла
Фелицата Феодора Феодосия Флора Фотина Харита Харитина Христина
Эвелина Эдита Элеонора Элина Элла Эльвира Эльга Эльза Эмилия Эмма
Эрика Эсфирь Юлиана Юния Юстина Ядвига Яна Янина Ярослава
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

_RU_LAST += """
Агеев Акимов Аксенов Алешин Ананьев Анисимов Аникин Анохин Артамонов
Артемов Архипов Астафьев Астахов Бабушкин Байков Балашов Барсуков
Басов Батурин Безруков Беликов Беляков Березин Беспалов Бессонов
Бирюков Блинов Блохин Бобров Бобылев Богомолов Большаков Бондарев
Борисенко Бородин Бочаров Брагин Буров Булгаков Бурков Быков Вавилов
Вдовин Верещагин Вешняков Вишневский Власов Волошин Воронин Воронов
Воронцов Галкин Гришин Громов Гуляев Гуров Гущин Данилин Дегтярев
Дементьев Демидов Денисов Дорофеев Дроздов Дубов Дубровин Дьяконов
Дьячков Евдокимов Евсеев Елизаров Елисеев Емельянов Ермаков Ермилов
Ершов Ефремов Жданов Жилин Журавлев Зимин Зиновьев Злобин Золотарев
Зорин Зотов Зыков Игнатов Игнатьев Измайлов Ильинский Исаков Кабанов
Калашников Калмыков Капустин Карасев Карташов Кириллов Кларин Клюев
Ковалев Кожевников Козырев Колосов Колпаков Комиссаров Коновалов
Кононов Коротков Корчагин Косарев Костин Котов Кочергин Кочетков
Кравцов Краснов Круглов Кулагин Кулаков Кулешов Куликов Курочкин
Лаптев Ларин Латышев Левин Литвинов Лихачев Лобанов Ломоносов Лосев
Лукашин Лыков Львов Любимов Ляпунов Мамонтов Маркелов Марков Маслов
Меркулов Мешков Мишин Моисеев Молчанов Муравьев Муратов Мухин Мышкин
Нашиванкин Нечаев Нестеров Никулин Носков Носов Овсянников Одинцов
Ожегов Озеров Панин Панков Панфилов Пастухов Пахомов Пестов Петухов
Пирогов Платонов Плотников Позднеев Покровский Полухин Потапов
Прокофьев Пугачев Раков Рогов Родин Рожков Розанов Романенко Рубцов
Рудаков Русаков Рыбаков Рыжов Савицкий Сазонов Самойлов Самсонов
Сахаров Свиридов Седов Селезнев Селиванов Семин Сизов Силин Симонов
Ситников Скворцов Смолин Снегирев Соловьев Сотников Стариков Старостин
Стрелков Субботин Суворов Судаков Сухарев Сысоев Терехов Токарев
Толкачев Третьяк Туманов Уваров Ульянов Усов Устинов Ушаков Фадеев
Федосеев Филатов Фокин Фомичев Хабаров Харитонов Хохлов Хромов
Царев Чеботарев Черепанов Черкасов Черняев Чижов Чистяков Чумаков
Шаповалов Шапошников Швецов Шевелев Шилов Ширяев Шишкин Шубин Шульгин
Щеглов Щукин Юдин Юрьев Яшин
""".split()
# safety net: every RU entry must be pure Cyrillic
_RU_LAST = [n for n in _RU_LAST if all("Ѐ" <= ch <= "ӿ" for ch in n)]
_RU_MALE_FIRST = [n for n in _RU_MALE_FIRST if all("Ѐ" <= ch <= "ӿ" for ch in n)]
_RU_FEMALE_FIRST = [n for n in _RU_FEMALE_FIRST if all("Ѐ" <= ch <= "ӿ" for ch in n)]

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

_RU_WORDS += """
автобус адрес активный английский апрель армия бабушка банк башня бежать
белье берег беседа библиотека билет благодарить близкий блюдо богатый
бой бок болезнь болеть больница боль бояться брат брать бросать бумага
буква бутылка быстро важный ванна вариант вверх вдруг ведь вежливый
великий верить вернуться верх веселый весна вести весь ветер вечер
вещь взгляд вздох взрослый взять видеть висеть вкус влажный власть
вместе внешний вниз внимание внук возможность воздух возраст война
вокзал вокруг волна волос воля восемь восток впервые впереди врач
вредный встреча встречать вчера выбор выбрать выйти высота выставка
выход газета галстук гараж гладкий глубокий гнездо говорить гора
гордый гореть горький горячий гостиница гость готовый граница грех
гриб громкий грудь грузовик группа грустный густой далекий дальше
дарить движение двор девушка дедушка дежурный декабрь делать дешевый
джинсы диван длинный добрый дождь доктор документ долгий должен
дорогой доска достать доход дочь древний дрожать дружба дуб дума
дышать еда единый ежедневно ездить елка есть ехать жалеть жаркий
ждать желание железо желтый жена женщина жестокий живой животное
жидкий журнал забота забыть завод завтра задача закрыть зал замок
занятие запад запах записать звать звезда звонить звук здание здесь
здоровье зеленый зеркало зима злой знакомый знамя значение золото
зуб игра играть идея известный извинить изучать икра интерес искать
искусство испытание июль июнь кабинет каждый казаться камень капля
карандаш карман карта картина касса качество каша квартира кино
кислый класс класть клуб ключ ковер кожа колесо количество колхоз
кольцо команда комната конверт кончить копейка корабль корень корова
короткий костюм кость котенок кофе край красивый красный крепкий
кресло крик кровь кролик кроме круг крупный крыло крыша кухня лампа
левый легкий лед лежать лекция лента лестница лететь лечить линия
лист литр ложка ломать лошадь лук луна лучше лыжи любовь магазин
май маленький мало мальчик марка март масло мастер материал мать
мебель медведь медленно международный мелкий меньше мера металл
метод метр мечта мешать мешок минута младший мнение многие модель
мокрый молодой молоко молчать море морковь мороз москвич мост мотор
мудрый муж мужчина музей мука мыло мысль мыть мягкий мясо наверх
навсегда надевать надежда назад название найти наконец налево
напиток направо например наука научить находить начать небольшой
неделя нежный некоторый нельзя немного несколько нести низкий
никогда никто ничего новость носить ноябрь нравиться нужный обед
обещать область обратно обувь общество объяснить обычный огонь
огромный одежда однажды однако озеро октябрь опасный опыт осень
основа особый оставить остановка остров ответ отдать отдых открыть
отличный отпуск отрасль охота очередь ошибка падать палец пальто
память папа пара парк партия пассажир перерыв песок печь пирог
письмо пить плавать плакать платье плечо плохой площадь победа
погода подарок подождать подруга поезд пожар поздний покупать
полезный полный половина помощь понять порядок посуда поток почта
поэт правда правило правый праздник предмет представить прекрасный
привет привычка приказ пример принести природа приятный провод
продавать продукт произведение пространство просить простой процент
прошлый прямо птица пустой пятно пять рабочий равный радость развитие
разговор размер район ранний рассказ расти ребенок редкий резать
результат рейс речь рисунок ровный родина родитель рост рот рубашка
рубль ружье рыба рынок рядом сад салат самолет сапог сахар свежий
светлый свободный связь север сегодняшний сезон секрет село сентябрь
серый серьезный сестра сидеть синий сказка скорость скучный слабый
сладкий следующий слеза слишком сложный служба слушать слышать
смелый смех смеяться смысл снег собака собрание событие совещание
согласен сойти сок сон соседний состав состояние сосна спать спектакль
спина спокойный спор способ средство срок ставить стакан стальной
станция старший старый статья стена степь стихи стол столица
столовая стоять страница странный страх строить студент стул
суббота судьба сумка суп сухой счастье счет съезд сыр таблица
тайна танец таскать театр телефон темный теплый терять тетрадь
техника течение тихий товар товарищ толстый тонкий торговля
тот точка трава трамвай требовать тревога трудный туда туман
тысяча тяжелый убрать уважение угол удар удобный удовольствие
уехать ужин узкий узнать указать улица улыбка умный универмаг
урожай урок усталый утренний ухо участок учебник ученик учитель
учить фабрика факт фамилия февраль ферма фильм флаг фонарь фраза
фрукт характер хватать химия хозяин холодный хороший художник
царь цвет цветок целый цена центр цирк чай чашка черный честный
четыре чистый член чтение чувство чудо чужой шапка шарф шахта
шея широкий шкаф шум шутка щека экзамен экран энергия этаж юг
юный яблоко явление ягода яйцо январь ясный ящик
""".split()
_RU_WORDS = [w for w in _RU_WORDS if all("Ѐ" <= ch <= "ӿ" for ch in w)]

_RU_PHONE_PATTERNS = [
    "8##########",
    "8 ### ### ####",
    "8(###)###-##-##",
]


# ---------------------------------------------------------------------------
# Morphological expansion to reference-scale cardinality.
#
# The reference ships ~10k words and ~9k first names per locale as flat
# data files (locale/en/strings.yml, locale/ru/strings.yml). Rather than
# paste a dictionary, we expand the curated base lists above with
# ordinary productive morphology (inflection, diminutives, surname
# suffixation) — deterministic, original lists whose cardinality is in
# the reference's range, so distinct-heavy configs stop clamping early.
# Derived forms are ordinary-looking inflected words/names; perfect
# dictionary membership is not required for synthetic values, only
# determinism + plausibility.

_EN_VOWELS = "aeiou"


def _expand_en_words(base: list[str]) -> list[str]:
    out = set(base)
    for w in base:
        if not w.isalpha() or not w.islower() or not (3 <= len(w) <= 12):
            continue
        # plural / 3rd-person -s
        if w.endswith(("s", "x", "z", "ch", "sh")):
            out.add(w + "es")
        elif w.endswith("y") and w[-2] not in _EN_VOWELS:
            out.add(w[:-1] + "ies")
        else:
            out.add(w + "s")
        # past -ed
        if w.endswith("e"):
            out.add(w + "d")
        elif w.endswith("y") and w[-2] not in _EN_VOWELS:
            out.add(w[:-1] + "ied")
        else:
            out.add(w + "ed")
        # progressive -ing (drop silent e)
        if w.endswith("e") and not w.endswith("ee"):
            out.add(w[:-1] + "ing")
        else:
            out.add(w + "ing")
        # agent / comparative -er
        if w.endswith("e"):
            out.add(w + "r")
        elif not w.endswith("y"):
            out.add(w + "er")
        # adverb -ly
        if not w.endswith(("ly", "y", "e")):
            out.add(w + "ly")
    return sorted(out)


# Compact original stem × ending composition for given names (the
# productive Germanic/Romance patterns behind most English first names).
_EN_NAME_STEMS = """
Ald Alv Ans Arn Bald Bart Beck Bell Ben Bern Bert Brad Bram Brock Burt
Cal Carl Ced Clem Cort Dav Del Den Dor Ed Eld Elm Erv Ev Farr Fel Ferd
Gar Gil God Grah Hal Ham Har Hild Hol Hug Irv Jar Jer Jor Kell Ken Kerw
Lam Lan Laur Lem Len Leon Lor Mal Marl Marv Mel Mer Mort Ned Nel New Norb
Norm Od Orl Orv Os Ran Ray Reg Rod Rol Rup Sand Sel Stan Ted Thur Tor Ulr
Vern Vin Wald Walt Ward Wend Wes Wilf Wilm Win Wood Wyn
""".split()

_EN_MALE_ENDINGS = ["an", "ard", "bert", "den", "don", "er", "ford", "in",
                    "is", "ley", "mond", "on", "son", "ton", "us", "win"]
_EN_FEMALE_ENDINGS = ["a", "ia", "ina", "ine", "elle", "ette", "een",
                      "issa", "lyn", "ara", "anne", "ora", "ella", "etta",
                      "ilda", "inda", "lene", "lisa", "mara", "nora",
                      "rose", "lia"]
_EN_FEMALE_COMPOUND = ["belle", "lee", "lynn", "rose", "mae"]


def _expand_en_names(
    base: list[str], endings: list[str], compounds: list[str] = []
) -> list[str]:
    out = set(base)
    for n in base:
        if not n.isalpha() or len(n) < 3:
            continue
        # diminutives: Rob -> Robbie / Robby, Juli(a) -> Julie
        if n[-1].lower() not in _EN_VOWELS + "y":
            out.add(n + "ie")
            out.add(n + "y")
            if compounds:
                out.add(n + "a")  # Kathryn -> Kathryna
        elif n.endswith("a") and len(n) >= 4:
            out.add(n[:-1] + "ie")
        # compound female names: Anna + belle -> Annabelle
        if compounds and len(n) <= 5 and n[-1].lower() in "ae":
            for c in compounds:
                if n[-1].lower() != c[0]:
                    out.add(n + c)
    for stem in _EN_NAME_STEMS:
        for end in endings:
            if stem[-1].lower() == end[0]:  # avoid doubled letter seams
                continue
            out.add(stem + end)
    return sorted(out)


_RU_HUSHING = "жчшщц"
_RU_VOWELS = "аеёиоуыэюя"


def _ru_stem(word: str) -> str:
    """Strip trailing vowels / soft signs to the consonant stem."""
    w = word
    while w and w[-1] in _RU_VOWELS + "ьй":
        w = w[:-1]
    return w


def _expand_ru_words(base: list[str]) -> list[str]:
    out = set(base)
    for w in base:
        if not (3 <= len(w) <= 12):
            continue
        if w.endswith(("ый", "ой")):  # adjective: gender/number/case forms
            st = w[:-2]
            out.update({st + "ая", st + "ое", st + "ые", st + "ых", st + "ым",
                        st + "ому", st + "о", "не" + w})
        elif w.endswith("ий") and len(w) >= 5:
            st = w[:-2]
            if st and st[-1] in _RU_HUSHING + "гкх":
                out.update({st + "ая", st + "ое", st + "ие", st + "их"})
            else:
                out.update({st + "яя", st + "ее", st + "ие", st + "их"})
        elif w.endswith("ть") and len(w) >= 5:  # verb: past/present + prefix
            st = w[:-2]
            out.update({st + "л", st + "ла", st + "ли",
                        "по" + w, "за" + w, "пере" + w})
            if w.endswith(("ать", "ять")):
                out.update({st + "ет", st + "ют"})  # делает, делают
            elif w.endswith("ить"):
                out.update({st[:-1] + "ит", st[:-1] + "ят"})  # говорит, -ят
        elif w.endswith(("а", "я")) and len(w) >= 4:  # a-stem noun: cases
            st, soft = w[:-1], w[-1] == "я"
            if st and st[-1] in _RU_HUSHING + "гкх":
                out.add(st + "и")
            else:
                out.add(st + ("и" if soft else "ы"))
            out.update({st + ("ями" if soft else "ами"), st + "е",
                        st + ("ю" if soft else "у"),
                        st + ("ей" if soft else "ой")})
            if not soft and st[-1] not in _RU_HUSHING + "гкх":
                out.add(st + "ка")  # diminutive: гора -> горка
        elif w[-1] not in _RU_VOWELS + "ьй":  # consonant-stem noun: cases
            if w[-1] in _RU_HUSHING + "гкх":
                out.update({w + "и", w + "ей" if w[-1] in _RU_HUSHING else w + "ов"})
            else:
                out.update({w + "ы", w + "ов", w + "ик"})
            out.update({w + "е", w + "ами", w + "ом", w + "у", w + "ах"})
    return sorted(w for w in out if all("Ѐ" <= ch <= "ӿ" for ch in w))


def _expand_ru_first(male: list[str], female: list[str]) -> tuple[list[str], list[str]]:
    m, f = set(male), set(female)
    for n in male:
        if n[-1] not in _RU_VOWELS + "ьй":
            m.add(n + "ий")   # church/full variant: Антон -> Антоний
            m.add(n + "ушка")  # diminutive: Иван -> Иванушка
    for n in female:
        if n.endswith(("а", "я")) and len(n) >= 4:
            f.add(n[:-1] + "ка")     # Светлана -> Светланка
            f.add(n[:-1] + "очка")   # Анна -> Анночка
    return sorted(m), sorted(f)


def _expand_ru_last(last: list[str], male_first: list[str], words: list[str]) -> list[str]:
    out = set(last)
    roots: set[str] = set()
    for src in (male_first, words):
        for w in src:
            st = _ru_stem(w.lower())
            if 3 <= len(st) <= 9 and st[-1] not in _RU_VOWELS:
                roots.add(st)
    for st in sorted(roots):
        cap = st.capitalize()
        soft = st[-1] in _RU_HUSHING
        ov = cap + ("ев" if soft else "ов")
        out.add(ov)
        out.add(cap + "ин")
        out.add(cap + ("евский" if soft else "овский"))
        out.add(cap + "енко")
        out.add(cap + ("юк" if st[-1] in "ль" else "ук"))
        if len(st) >= 4:
            out.add(cap + "ский")
    # feminine surname forms (-ов -> -ова, -ин -> -ина, -ский -> -ская)
    fem = set()
    for s in out:
        if s.endswith(("ов", "ев", "ин", "ын")):
            fem.add(s + "а")
        elif s.endswith("ский"):
            fem.add(s[:-2] + "ая")
        elif s.endswith("цкий"):
            fem.add(s[:-2] + "ая")
    out |= fem
    return sorted(s for s in out if all("Ѐ" <= ch <= "ӿ" for ch in s))


_EN_WORDS = _expand_en_words(_EN_WORDS)
_EN_MALE_FIRST = _expand_en_names(_EN_MALE_FIRST, _EN_MALE_ENDINGS)
_EN_FEMALE_FIRST = _expand_en_names(
    _EN_FEMALE_FIRST, _EN_FEMALE_ENDINGS, _EN_FEMALE_COMPOUND
)
# surnames derive from the *base* name/word lists (expanding first would
# suffix diminutive forms into surname roots)
_RU_LAST = _expand_ru_last(_RU_LAST, _RU_MALE_FIRST + _RU_FEMALE_FIRST, _RU_WORDS)
_RU_MALE_FIRST, _RU_FEMALE_FIRST = _expand_ru_first(_RU_MALE_FIRST, _RU_FEMALE_FIRST)
_RU_WORDS = _expand_ru_words(_RU_WORDS)


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
